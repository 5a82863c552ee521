"""Lock-discipline checker (shared/guarded.py) — the dynamic analogue of the
reference's Clang GUARDED_BY annotations + WorldStateLock capability types
(shared/WorldStateLock.h, WorldState.h:44-63).
"""

import threading

import pytest

from substrata_tpu.shared.guarded import (CheckedRLock, LockDisciplineError,
                                          guard)


def _mk(container):
    lock = CheckedRLock("test.lock")
    return lock, guard(container, lock, "test.container")


def test_dict_access_requires_lock(monkeypatch):
    monkeypatch.setenv("SUBSTRATA_LOCK_CHECKS", "1")
    lock, d = _mk({})
    with pytest.raises(LockDisciplineError):
        d[1] = "x"
    with pytest.raises(LockDisciplineError):
        _ = 1 in d
    with pytest.raises(LockDisciplineError):
        d.get(1)
    with lock:
        d[1] = "x"
        assert d[1] == "x"
        assert d.get(1) == "x"
        assert list(d.items()) == [(1, "x")]
        d.pop(1)
    with pytest.raises(LockDisciplineError):
        len(d)


def test_set_and_list_access_requires_lock(monkeypatch):
    monkeypatch.setenv("SUBSTRATA_LOCK_CHECKS", "1")
    lock, s = _mk(set())
    with pytest.raises(LockDisciplineError):
        s.add(1)
    with lock:
        s.add(1)
        s.discard(1)
    lock2, lst = _mk([])
    with pytest.raises(LockDisciplineError):
        lst.append(1)
    with lock2:
        lst.append(1)
        assert lst[0] == 1


def test_reentrant_and_cross_thread():
    lock = CheckedRLock("re.lock")
    d = guard({}, lock, "re.d")
    with lock:
        with lock:                     # re-entrant acquire
            d["a"] = 1
        d["b"] = 2                     # still held after inner release
    errors = []

    def other():
        try:
            _ = d.get("a")
        except LockDisciplineError as e:
            errors.append(e)

    # Holding the lock on THIS thread must not authorise another thread.
    with lock:
        t = threading.Thread(target=other)
        t.start()
        t.join()
    assert len(errors) == 1


def test_guard_passthrough_when_disabled(monkeypatch):
    monkeypatch.delenv("SUBSTRATA_LOCK_CHECKS", raising=False)
    d = {}
    assert guard(d, threading.RLock(), "x") is d


def test_copy_returns_unguarded_snapshot():
    lock, d = _mk({})
    with lock:
        d[1] = "x"
        snap = d.copy()
    # The snapshot is a plain dict usable outside the lock.
    assert snap[1] == "x"


def test_client_world_state_is_guarded():
    from substrata_tpu.net.client import ClientWorldState
    ws = ClientWorldState(capacity=16)
    with pytest.raises(LockDisciplineError):
        ws.objects[1] = object()
    with ws.lock:
        ws.objects[1] = object()
        assert 1 in ws.objects


def test_server_world_state_is_guarded():
    from substrata_tpu.net.server import ServerAllWorldsState
    aws = ServerAllWorldsState()
    w = aws.get_world("")
    with pytest.raises(LockDisciplineError):
        w.objects[1] = object()
    with aws.lock:
        w.objects[1] = object()
        assert 1 in w.objects
