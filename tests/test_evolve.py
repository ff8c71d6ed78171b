"""training/evolve.py: genetic hyp evolution (train.py:590-700 parity)."""
import os

import numpy as np
import pytest

from hamer_yolo_tpu.training.evolve import (
    DEFAULT_HYP, META, N_RESULT_COLS, EvolveLog, evolve, fitness, mutate_hyp,
)


class TestFitness:
    def test_weights(self):
        # utils/metrics.py:12-16: w = [0, 0, 0.1, 0.9] over P, R, map50, map
        x = np.array([[0.5, 0.5, 0.6, 0.4, 0, 0, 0]])
        np.testing.assert_allclose(fitness(x), [0.1 * 0.6 + 0.9 * 0.4])

    def test_row_vector(self):
        assert fitness(np.array([1.0, 1.0, 1.0, 1.0, 9, 9, 9])).shape == (1,)


class TestMutate:
    def test_first_generation_unmutated(self):
        rng = np.random.default_rng(0)
        hyp = mutate_hyp({}, np.zeros((0, N_RESULT_COLS + len(META))), rng)
        for k, v in DEFAULT_HYP.items():
            assert hyp[k] == pytest.approx(
                min(max(v, META[k][1]), META[k][2]), abs=1e-5), k

    def test_mutation_respects_limits_and_changes(self):
        rng = np.random.default_rng(1)
        keys = list(META)
        parent = np.array([0.5, 0.5, 0.5, 0.5, 0, 0, 0]
                          + [DEFAULT_HYP[k] for k in keys])
        history = parent[None]
        changed = 0
        for _ in range(5):
            hyp = mutate_hyp(DEFAULT_HYP, history, rng)
            for k in keys:
                lo, hi = META[k][1], META[k][2]
                assert lo - 1e-9 <= hyp[k] <= hi + 1e-9, k
            if any(hyp[k] != DEFAULT_HYP[k] for k in keys):
                changed += 1
        assert changed >= 4  # mp=0.8: essentially always mutates something

    def test_zero_gain_keys_never_mutate(self):
        rng = np.random.default_rng(2)
        keys = list(META)
        parent = np.array([0.9, 0.9, 0.9, 0.9, 0, 0, 0]
                          + [DEFAULT_HYP[k] for k in keys])
        for _ in range(10):
            hyp = mutate_hyp(DEFAULT_HYP, parent[None], rng)
            # gain-0 keys (iou_t, fl_gamma, perspective, fliplr) stay put
            for k in ("iou_t", "fl_gamma", "perspective", "fliplr"):
                assert hyp[k] == pytest.approx(DEFAULT_HYP[k], abs=1e-5), k

    def test_deterministic_given_seed(self):
        keys = list(META)
        parent = np.array([0.5, 0.6, 0.7, 0.8, 0, 0, 0]
                          + [DEFAULT_HYP[k] for k in keys])
        a = mutate_hyp(DEFAULT_HYP, parent[None], np.random.default_rng(3))
        b = mutate_hyp(DEFAULT_HYP, parent[None], np.random.default_rng(3))
        assert a == b


class TestEvolveLog:
    def test_record_sorts_by_fitness_and_exports_yaml(self, tmp_path):
        import yaml

        elog = EvolveLog(str(tmp_path))
        h1 = dict(DEFAULT_HYP, lr0=0.02)
        h2 = dict(DEFAULT_HYP, lr0=0.005)
        elog.record(h1, (0.1, 0.1, 0.2, 0.1))  # fitness 0.11
        best = elog.record(h2, (0.5, 0.5, 0.6, 0.5))  # fitness 0.51 -> best
        assert best["lr0"] == pytest.approx(0.005)
        hist = elog.history()
        assert hist.shape == (2, N_RESULT_COLS + len(META))
        assert fitness(hist)[0] >= fitness(hist)[1]  # sorted desc
        with open(elog.yaml) as f:
            body = f.read()
        assert body.startswith("# Hyperparameter Evolution Results")
        loaded = yaml.safe_load(body)
        assert loaded["lr0"] == pytest.approx(0.005)

    def test_duplicate_rows_unique(self, tmp_path):
        elog = EvolveLog(str(tmp_path))
        h = dict(DEFAULT_HYP)
        elog.record(h, (0.1, 0.1, 0.2, 0.1))
        elog.record(h, (0.1, 0.1, 0.2, 0.1))
        assert elog.history().shape[0] == 1


class TestEvolveLoop:
    def test_converges_toward_better_fitness(self, tmp_path):
        """Fake objective: fitness peaks at lr0=0.05 — evolution must
        improve over generations and export the best candidate."""
        seen = []

        def train_and_eval(hyp, gen):
            score = float(np.exp(-((np.log10(hyp["lr0"]) + 1.30103) ** 2)))
            seen.append(score)
            return (0.0, 0.0, 0.0, score)  # fitness = 0.9 * score

        best = evolve(train_and_eval, generations=12, out_dir=str(tmp_path),
                      seed=4, log=lambda s: None)
        hist = np.loadtxt(os.path.join(tmp_path, "evolve.txt"), ndmin=2)
        assert hist.shape[0] >= 10  # unique rows recorded
        # the best recorded fitness beats the seed generation's
        assert max(seen[1:]) >= seen[0]
        assert os.path.exists(os.path.join(tmp_path, "hyp_evolved.yaml"))
        assert set(best) == set(META)
