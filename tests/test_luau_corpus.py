"""The reference's own Luau example corpus must run unmodified.

Scripts are extracted from the reference's documentation pages
(webserver_fragments/example_luau_scripts.htmlfrag and
about_luau_scripting.htmlfrag) and executed in the from-scratch Lua
interpreter with the Substrata bindings.  This exercises the Luau-dialect
extensions (compound assignment, `continue`, string interpolation, type
annotations, generalised table iteration — shared/SubstrataLuaVM.h:21-67)
against real-world scripts rather than synthetic cases.
"""

import html
import os
import re

import numpy as np
import pytest

from substrata_tpu.scripting.events import ScriptVM
from substrata_tpu.scripting.lua_api import LuaScriptEvaluator
from substrata_tpu.shared.world_object import WorldObject

_REF = "/root/reference/webserver_fragments"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(_REF), reason="reference corpus not present")


def _blocks(fname):
    src = open(os.path.join(_REF, fname)).read()
    return [html.unescape(b).strip()
            for b in re.findall(r'<pre class="code-block">(.*?)</pre>',
                                src, re.S)]


class CorpusWorld:
    """World interface with every hook the corpus scripts touch."""

    def __init__(self):
        self.objects = {}
        self.modified = []
        self.moves = []
        self.rotates = []

    def object_modified(self, ob):
        self.modified.append(getattr(ob, "uid", 0))

    def move_to(self, uid, pos, duration):
        self.moves.append((uid, tuple(pos), duration))

    def rotate_to(self, uid, axis, angle, duration):
        self.rotates.append((uid, tuple(axis), angle, duration))

    def get_secret(self, name):
        return "test-secret"


class FakeAvatar:
    def __init__(self, uid, name, vehicle=None):
        self.uid = uid
        self.name = name
        self.pos = np.array([1.0, 2.0, 1.67])
        self.linear_velocity = np.zeros(3)
        self.vehicle_inside = vehicle


def _make_vm():
    w = CorpusWorld()
    now = [0.0]
    vm = ScriptVM(world_interface=w, clock=lambda: now[0])
    return vm, w, now


def _run(vm, src, this_object=None):
    return LuaScriptEvaluator(vm, src, this_object=this_object)


def _world_with_objects(w, uids):
    for uid in uids:
        ob = WorldObject(uid=uid)
        ob.materials = [{"colour": (1.0, 1.0, 1.0)}]
        ob.content = ""
        w.objects[uid] = ob


# The jump-pad example is truncated in the reference HTML itself (the
# closing `end` is missing from the <pre> block — real Luau would reject it
# too); everything else runs byte-for-byte as published.
def _fixup(src):
    if ("avatar.linear_velocity = new_v" in src
            and not src.rstrip().endswith("end")):
        return src + "\nend"
    return src


_EXAMPLES = ([_fixup(b) for b in _blocks("example_luau_scripts.htmlfrag")]
             if os.path.isdir(_REF) else [])


def _find(marker):
    return next(b for b in _EXAMPLES if marker in b)


@pytest.mark.parametrize("i", range(len(_EXAMPLES)))
def test_example_scripts_load(i):
    vm, w, now = _make_vm()
    _world_with_objects(w, [583, 584, 585, 587, 588, 589, 600])
    ev = _run(vm, _EXAMPLES[i], this_object=w.objects[600])
    assert not ev.hit_error, ev.error_messages


def test_race_script_end_to_end():
    """Drive the full race: start gate -> waypoints -> finish, checking the
    leaderboard persists through objectstorage (the corpus's largest
    script, exercising generalised iteration + annotations + tables)."""
    vm, w, now = _make_vm()
    # this_object (600) is NOT a waypoint: the corpus says "apply the
    # script to an object" separate from the waypoint sensors.
    _world_with_objects(w, [583, 584, 585, 587, 588, 589, 600])
    src = _find("race_info")
    bike = WorldObject(uid=901)
    bike.mass = 200.0
    w.objects[901] = bike
    av = FakeAvatar(uid=55, name="zed", vehicle=bike)
    w.objects[55] = av

    ev = _run(vm, src, this_object=w.objects[600])
    assert not ev.hit_error, ev.error_messages

    # Touch the gates in order: 587 (start), 583, 584, 585, 587 (finish).
    for gate in (587, 583, 584, 585):
        vm.fire_user_touched_object(gate, avatar_uid=55)
        now[0] += 3.0
    vm.fire_user_touched_object(587, avatar_uid=55)
    assert not ev.hit_error, ev.error_messages
    assert any("Race Started" in m for m in vm.messages_to_user)
    assert any("Finish!" in m for m in vm.messages_to_user), vm.messages_to_user
    # Best time stored persistently + scoreboard text updated.
    assert vm.object_storage.get("best_times"), vm.object_storage
    assert "zed" in w.objects[589].content


def test_jump_pad_sets_avatar_velocity():
    vm, w, now = _make_vm()
    _world_with_objects(w, [583])
    av = FakeAvatar(uid=55, name="zed")
    w.objects[55] = av
    src = _find("avatar.linear_velocity = new_v")
    ev = _run(vm, src, this_object=w.objects[583])
    vm.fire_user_touched_object(583, avatar_uid=55)
    assert not ev.hit_error, ev.error_messages
    assert av.linear_velocity[2] == 10.0


def test_move_forward_script_calls_move_to():
    vm, w, now = _make_vm()
    _world_with_objects(w, [583])
    w.objects[583].pos = np.array([5.0, 0.0, 1.0])
    src = _find("MOVE_DURATION")
    ev = _run(vm, src, this_object=w.objects[583])
    vm.fire_user_used_object(583, avatar_uid=55)
    assert not ev.hit_error, ev.error_messages
    assert w.moves and w.moves[0][0] == 583
    assert w.moves[0][1][0] == 15.0        # pos.x + 10
    assert w.moves[0][2] == 5.0            # MOVE_DURATION


# about_luau_scripting.htmlfrag: blocks that are executable Lua (the others
# document type SHAPES `{ response_code: number ... }` and enum constants
# `ErrorCode_OK = 0,` — not statements, skipped with reason).
def _is_doc_shape(b):
    return b.startswith("{") or re.match(r"^\w+ = \d+,", b)


def _fix_doc_typo(b):
    # The doHTTP*RequestAsync usage examples in the reference docs are
    # missing the comma after the additional-header-lines table (a typo in
    # the published page — real Luau rejects it too).  Insert it so the
    # rest of the block exercises the real call path.
    return b.replace('} -- additional_header_lines\n',
                     '}, -- additional_header_lines\n')


_ABOUT = ([_fix_doc_typo(b) for b in _blocks("about_luau_scripting.htmlfrag")
           if not _is_doc_shape(b)] if os.path.isdir(_REF) else [])


@pytest.mark.parametrize("i", range(len(_ABOUT)))
def test_about_scripts_load(i):
    vm, w, now = _make_vm()
    _world_with_objects(w, [583])
    ev = _run(vm, _ABOUT[i], this_object=w.objects[583])
    assert not ev.hit_error, ev.error_messages
