"""ManifestStore CAS contract: the CDC commit protocol's concurrency
seam. The same contract suite runs against the local POSIX
implementation AND an in-memory test double (the stand-in for a
transactional object-store binding), pinning the protocol — not one
implementation's accidents. No SparkSession needed."""

import threading

import pytest

from gasket_spark.streaming.core import (
    CommitConflictError, LocalManifestStore, ManifestStore, _manifest_etag,
)


class InMemoryManifestStore(ManifestStore):
    """Test double: a dict + a lock — the minimal transactional store.
    Mirrors what an S3 If-Match / DynamoDB conditional-write binding
    provides: atomic compare-etag-and-swap on the pointer."""

    def __init__(self):
        self._data: dict[str, dict] = {}
        self._mu = threading.Lock()

    def read(self, pointer):
        with self._mu:
            man = self._data.get(pointer)
            return ((None, None) if man is None
                    else (dict(man), _manifest_etag(man)))

    def put_if_match(self, pointer, man, expected_etag):
        with self._mu:
            cur = self._data.get(pointer)
            cur_etag = None if cur is None else _manifest_etag(cur)
            if cur_etag != expected_etag:
                raise CommitConflictError(
                    f"expected {expected_etag}, current {cur_etag}")
            self._data[pointer] = dict(man)

    def put_immutable(self, path, man):
        with self._mu:
            self._data[path] = dict(man)


@pytest.fixture(params=["local", "memory"])
def store_and_pointer(request, tmp_path):
    if request.param == "local":
        return LocalManifestStore(), str(tmp_path / "LATEST")
    return InMemoryManifestStore(), "tbl/LATEST"


M1 = {"batch": 0, "gen": 0, "buckets": {}}
M2 = {"batch": 1, "gen": 0, "buckets": {"0": []}}
M3 = {"batch": 2, "gen": 0, "buckets": {"1": []}}


class TestCasContract:
    def test_put_if_absent_then_read(self, store_and_pointer):
        store, ptr = store_and_pointer
        assert store.read(ptr) == (None, None)
        store.put_if_match(ptr, M1, None)
        man, etag = store.read(ptr)
        assert man["batch"] == 0 and etag is not None

    def test_put_if_absent_conflicts_when_present(self, store_and_pointer):
        store, ptr = store_and_pointer
        store.put_if_match(ptr, M1, None)
        with pytest.raises(CommitConflictError):
            store.put_if_match(ptr, M2, None)

    def test_stale_etag_conflicts_and_fresh_wins(self, store_and_pointer):
        """The read-modify-write race: two writers base their update on
        the same etag; after the first commits, the second's
        conditional put must fail LOUDLY — and succeed only after
        re-reading the new state."""
        store, ptr = store_and_pointer
        store.put_if_match(ptr, M1, None)
        _, shared_etag = store.read(ptr)
        store.put_if_match(ptr, M2, shared_etag)       # writer A wins
        with pytest.raises(CommitConflictError):
            store.put_if_match(ptr, M3, shared_etag)   # writer B loses
        _, fresh = store.read(ptr)
        store.put_if_match(ptr, M3, fresh)             # B's re-derive lands
        man, _ = store.read(ptr)
        assert man["batch"] == 2

    def test_concurrent_committers_exactly_one_wins(self, store_and_pointer):
        """N threads race a conditional put from the same base etag:
        exactly one commit lands, every other raises
        CommitConflictError — never a silent overwrite."""
        store, ptr = store_and_pointer
        store.put_if_match(ptr, M1, None)
        _, base = store.read(ptr)
        barrier = threading.Barrier(8)
        outcomes: list[str] = []
        mu = threading.Lock()

        def committer(i: int) -> None:
            barrier.wait()
            try:
                store.put_if_match(ptr, {"batch": 1, "gen": i}, base)
                res = f"won:{i}"
            except CommitConflictError:
                res = "conflict"
            with mu:
                outcomes.append(res)

        threads = [threading.Thread(target=committer, args=(i,))
                   for i in range(8)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        wins = [o for o in outcomes if o.startswith("won")]
        assert len(wins) == 1
        assert outcomes.count("conflict") == 7
        man, _ = store.read(ptr)
        assert man["gen"] == int(wins[0].split(":")[1])


class TestLocalStoreSpecifics:
    def test_stranded_lock_fails_loudly(self, tmp_path):
        """A lock file left by a crashed committer makes later commits
        raise (in-flight) rather than break the lock or overwrite."""
        store = LocalManifestStore()
        ptr = str(tmp_path / "LATEST")
        store.put_if_match(ptr, M1, None)
        _, etag = store.read(ptr)
        open(ptr + ".lock", "w").close()
        with pytest.raises(CommitConflictError, match="in flight"):
            store.put_if_match(ptr, M2, etag)

    def test_etag_equals_stored_checksum(self, tmp_path):
        """The CAS token for a v2 manifest IS its stored checksum —
        the object-store ETag discipline, byte for byte."""
        import json

        store = LocalManifestStore()
        ptr = str(tmp_path / "LATEST")
        store.put_if_match(ptr, M1, None)
        with open(ptr) as fh:
            on_disk = json.load(fh)
        _, etag = store.read(ptr)
        assert etag == on_disk["checksum"]
