"""Distance-prioritised loading tests (LoadItemQueue + ProximityLoader)."""

import numpy as np

from substrata_tpu.loading import LoadItemQueue, ProximityLoader


def test_load_queue_priority_and_dedup():
    q = LoadItemQueue()
    assert q.enqueue("far.glb", [100, 0, 0], "far")
    assert q.enqueue("near.glb", [1, 0, 0], "near")
    assert q.enqueue("mid.glb", [50, 0, 0], "mid")
    assert not q.enqueue("near.glb", [1, 0, 0], "dup")  # dedup
    out = [k for k, t in q.pop_n(3)]
    assert out == ["near.glb", "mid.glb", "far.glb"]
    assert len(q) == 0


def test_load_queue_reprioritises_on_camera_move():
    q = LoadItemQueue()
    q.enqueue("a.glb", [100, 0, 0], None)
    q.enqueue("b.glb", [0, 0, 0], None)
    q.update_campos([100, 0, 0])  # camera jumps next to 'a'
    out = [k for k, t in q.pop_n(2)]
    assert out == ["a.glb", "b.glb"]


def test_load_queue_cancel_and_budget():
    q = LoadItemQueue()
    for i in range(5):
        q.enqueue(f"{i}.glb", [i, 0, 0], i)
    q.cancel("0.glb")
    out = [k for k, t in q.pop_n(2)]  # per-tick budget of 2
    assert out == ["1.glb", "2.glb"]
    assert len(q) == 2


def test_proximity_loader_transitions():
    class Ob:
        def __init__(self, pos):
            self.pos = np.asarray(pos, np.float64)
    objects = {1: Ob([0, 0, 0]), 2: Ob([500, 0, 0])}
    events = []
    pl = ProximityLoader(load_distance=100.0,
                         on_object_entered=lambda ob: events.append("in"),
                         on_object_left=lambda ob: events.append("out"))
    entered, left = pl.update([0, 0, 0], objects)
    assert entered == [1] and left == []
    # No re-fire while still in range.
    entered, left = pl.update([1, 0, 0], objects)
    assert entered == [] and left == []
    # Walk away: object 1 leaves, object 2 enters.
    entered, left = pl.update([460, 0, 0], objects)
    assert entered == [2] and left == [1]
    assert events == ["in", "in", "out"]
