"""Tests: utils/downloads.py checkpoint resolver (google_utils.py parity:
attempt_download:19 semantics — cache-first, egress-gated, no partials)."""
import hashlib
import os

import pytest

from hamer_yolo_tpu.utils import downloads as dl


@pytest.fixture(autouse=True)
def _isolate_caches(tmp_path_factory, monkeypatch):
    """Negative-path tests must not see a stray machine-level cache: drop
    $HYT_WEIGHTS and point the user cache (~/.cache/hamer_yolo_tpu) at a
    fresh tmp dir via $HOME."""
    monkeypatch.delenv("HYT_WEIGHTS", raising=False)
    monkeypatch.setenv("HOME", str(tmp_path_factory.mktemp("isohome")))


class TestFindWeights:
    def test_explicit_path_wins(self, tmp_path):
        f = tmp_path / "w.pt"
        f.write_bytes(b"x")
        assert dl.find_weights(str(f)) == str(f)

    def test_search_dir_by_basename(self, tmp_path):
        (tmp_path / "yolov7_best.pt").write_bytes(b"x")
        got = dl.find_weights("some/dir/yolov7_best.pt", search=[str(tmp_path)])
        assert got == str(tmp_path / "yolov7_best.pt")

    def test_hyt_weights_env(self, tmp_path, monkeypatch):
        (tmp_path / "hamer.ckpt").write_bytes(b"x")
        monkeypatch.setenv("HYT_WEIGHTS", str(tmp_path))
        assert dl.find_weights("hamer.ckpt") == str(tmp_path / "hamer.ckpt")

    def test_missing_returns_none(self):
        assert dl.find_weights("definitely_not_there.pt") is None


class TestAttemptDownload:
    def test_local_hit_skips_network(self, tmp_path):
        f = tmp_path / "w.pt"
        f.write_bytes(b"data")
        assert dl.attempt_download(str(f)) == str(f)

    def test_checksum_verified_on_local_hit(self, tmp_path):
        f = tmp_path / "w.pt"
        f.write_bytes(b"data")
        good = hashlib.sha256(b"data").hexdigest()
        assert dl.attempt_download(str(f), sha256_hex=good) == str(f)
        with pytest.raises(ValueError, match="checksum"):
            dl.attempt_download(str(f), sha256_hex="0" * 64)

    def test_gated_off_by_default(self, monkeypatch):
        monkeypatch.delenv("HYT_ALLOW_DOWNLOAD", raising=False)
        # known asset name, no local copy, gate closed -> None, no egress
        assert dl.attempt_download("yolov7-tiny.pt") is None

    def test_unknown_name_never_fetches(self):
        assert dl.attempt_download("mystery.bin", allow_download=True) is None

    def test_fetch_atomic_and_checksummed(self, tmp_path, monkeypatch):
        # fake urlopen: no real network involved
        import io
        import urllib.request

        payload = b"checkpoint-bytes"
        monkeypatch.setattr(urllib.request, "urlopen",
                            lambda url, timeout=None: io.BytesIO(payload))
        good = hashlib.sha256(payload).hexdigest()
        got = dl.attempt_download("w.pt", url="http://x/w.pt",
                                  sha256_hex=good, allow_download=True,
                                  dest_dir=str(tmp_path))
        assert got == str(tmp_path / "w.pt")
        assert (tmp_path / "w.pt").read_bytes() == payload
        assert not list(tmp_path.glob("*.part"))

    def test_bad_fetch_leaves_nothing(self, tmp_path, monkeypatch):
        import io
        import urllib.request

        monkeypatch.setattr(urllib.request, "urlopen",
                            lambda url, timeout=None: io.BytesIO(b"corrupt"))
        with pytest.raises(ValueError, match="checksum"):
            dl.attempt_download("w.pt", url="http://x/w.pt",
                                sha256_hex="0" * 64, allow_download=True,
                                dest_dir=str(tmp_path))
        assert list(tmp_path.iterdir()) == []  # no partials, no target

    def test_corrupt_cache_entry_deleted_and_refetched(self, tmp_path,
                                                       monkeypatch):
        # Reference attempt_download removes a bad file and re-fetches
        # (google_utils.py): a corrupted CACHE entry must not permanently
        # block resolution. Explicit user paths still raise (see
        # test_checksum_verified_on_local_hit).
        import io
        import urllib.request

        (tmp_path / "w.pt").write_bytes(b"corrupt")
        payload = b"good-bytes"
        good = hashlib.sha256(payload).hexdigest()
        monkeypatch.setattr(urllib.request, "urlopen",
                            lambda url, timeout=None: io.BytesIO(payload))
        got = dl.attempt_download("w.pt", url="http://x/w.pt",
                                  sha256_hex=good, allow_download=True,
                                  search=[str(tmp_path)],
                                  dest_dir=str(tmp_path))
        assert got == str(tmp_path / "w.pt")
        assert (tmp_path / "w.pt").read_bytes() == payload

    def test_corrupt_cache_entry_gate_closed_raises_and_survives(
            self, tmp_path):
        # With the download gate closed (or no URL) a re-fetch is
        # impossible, so even a resolver-managed corrupt entry is KEPT
        # (it is the only copy) and the mismatch raises. Deletion only
        # happens when a replacement will actually be downloaded
        # (test_corrupt_cache_entry_deleted_and_refetched).
        (tmp_path / "w.pt").write_bytes(b"corrupt")
        with pytest.raises(ValueError, match="checksum"):
            dl.attempt_download("w.pt", sha256_hex="0" * 64,
                                search=[str(tmp_path)],
                                dest_dir=str(tmp_path))
        assert (tmp_path / "w.pt").exists()  # only copy preserved
        # gate open but the name has no URL at all -> same posture
        (tmp_path / "definitely-not-a-known-asset.pt").write_bytes(b"corrupt")
        with pytest.raises(ValueError, match="checksum"):
            dl.attempt_download("definitely-not-a-known-asset.pt",
                                sha256_hex="0" * 64,
                                search=[str(tmp_path)],
                                dest_dir=str(tmp_path),
                                allow_download=True)
        assert (tmp_path / "definitely-not-a-known-asset.pt").exists()

    def test_corrupt_cache_survives_failed_refetch(self, tmp_path,
                                                   monkeypatch):
        # Gate open + URL resolvable, but the DOWNLOAD fails: the corrupt
        # cached copy must survive (deletion happens only after a
        # verified replacement lands).
        import urllib.request

        (tmp_path / "w.pt").write_bytes(b"corrupt")

        def boom(url, timeout=None):
            raise OSError("network down")

        monkeypatch.setattr(urllib.request, "urlopen", boom)
        with pytest.raises(OSError, match="network down"):
            dl.attempt_download("w.pt", url="http://x/w.pt",
                                sha256_hex="0" * 64, allow_download=True,
                                search=[str(tmp_path)],
                                dest_dir=str(tmp_path))
        assert (tmp_path / "w.pt").read_bytes() == b"corrupt"

    def test_user_owned_dir_never_deleted(self, tmp_path, monkeypatch):
        # $HYT_WEIGHTS / caller search dirs are user-owned: a checksum
        # mismatch raises and the file survives (no silent data loss).
        (tmp_path / "w.pt").write_bytes(b"user weights")
        monkeypatch.setenv("HYT_WEIGHTS", str(tmp_path))
        with pytest.raises(ValueError, match="checksum"):
            dl.attempt_download("w.pt", sha256_hex="0" * 64)
        assert (tmp_path / "w.pt").read_bytes() == b"user weights"
        with pytest.raises(ValueError, match="checksum"):
            dl.attempt_download("w.pt", sha256_hex="0" * 64,
                                search=[str(tmp_path)])
        assert (tmp_path / "w.pt").exists()

    def test_known_assets_table(self):
        assert "yolov7.pt" in dl.KNOWN_ASSETS
        assert all(u.startswith("https://") for u in dl.KNOWN_ASSETS.values())
