"""Tests for the from-scratch Lua interpreter + Substrata bindings.

The reference runs ``--lua``-prefixed object scripts in Luau
(shared/SubstrataLuaVM.cpp, shared/LuaScriptEvaluator.cpp); these tests
cover the language core the interpreter must support and the Substrata API
surface (addEventListener / createTimer / object proxies / objectstorage /
parseJSON), including the sandbox guarantees (budget, no IO).
"""

import numpy as np
import pytest

from substrata_tpu.scripting.events import ScriptExecutionError, ScriptVM
from substrata_tpu.scripting.lua import (
    Interpreter, LuaError, LuaTable, ScriptBudgetExceeded)
from substrata_tpu.shared.world_object import WorldObject


def run(src, budget=1_000_000):
    ip = Interpreter(budget=budget)
    ip.run(src)
    return ip.output


# ---------------------------------------------------------------------------
# Language core
# ---------------------------------------------------------------------------

def test_arith_and_precedence():
    assert run("print(1 + 2 * 3 ^ 2 - 4 / 2)") == ["17"]
    assert run("print(7 % 3, -7 % 3, 2 ^ -1)") == ["1\t2\t0.5"]
    assert run("print(1 < 2, 'a' .. 'b' .. 1, #'hello')") == ["true\tab1\t5"]


def test_locals_scoping_and_closures():
    out = run("""
local function counter()
  local n = 0
  return function() n = n + 1 return n end
end
local c1, c2 = counter(), counter()
c1(); c1()
print(c1(), c2())
""")
    assert out == ["3\t1"]


def test_control_flow():
    out = run("""
local s = 0
for i = 1, 10, 2 do s = s + i end
local j = 0
while j < 3 do j = j + 1 end
repeat j = j + 1 until j >= 5
for i = 10, 1 do s = s + 1000 end   -- empty range
if s == 25 and j == 5 then print("ok", s, j) else print("bad", s, j) end
""")
    assert out == ["ok\t25\t5"]


def test_tables_and_generic_for():
    out = run("""
local t = {10, 20, 30, x = "ex", [99] = "ni"}
local ks = {}
for k, v in pairs(t) do table.insert(ks, tostring(k) .. "=" .. tostring(v)) end
table.sort(ks)
print(#t, t.x, t[99], table.concat(ks, ","))
""")
    assert out == ["3\tex\tni\t1=10,2=20,3=30,99=ni,x=ex"]


def test_multiple_returns_and_varargs():
    out = run("""
local function multi(...) return select('#', ...), ... end
local n, a, b = multi('x', 'y')
print(n, a, b)
local function pack2(...) local t = {...} return #t end
print(pack2(1, 2, 3, nil))         -- trailing nil drops from the border
""")
    assert out[0] == "2\tx\ty"


def test_metatables_oop_and_operators():
    out = run("""
local V = {}
V.__index = V
V.__add = function(a, b) return V.new(a.x + b.x) end
V.__eq = function(a, b) return a.x == b.x end
V.__tostring = function(v) return "V(" .. v.x .. ")" end
V.__len = function(v) return v.x end
function V.new(x) return setmetatable({x = x}, V) end
function V:double() self.x = self.x * 2 return self end
local a = V.new(3):double()
print(tostring(a + V.new(1)), a == V.new(6), #a)
""")
    assert out == ["V(7)\ttrue\t6"]


def test_string_library_and_patterns():
    out = run("""
print(("Hello World"):lower())
print(string.format("%05.1f|%x|%s", 3.25, 255, "s"))
print(string.find("abc def", "(%a+) (%a+)"))
print(string.gsub("a1b2c3", "%d", function(d) return "<" .. d .. ">" end))
local words = {}
for w in string.gmatch("alpha, beta, gamma", "%a+") do words[#words+1] = w end
print(table.concat(words, "/"))
print(string.rep("ab", 3), ("xyz"):byte(1))
""")
    assert out == ["hello world", "003.2|ff|s", "1\t7\tabc\tdef",
                   "a<1>b<2>c<3>\t3", "alpha/beta/gamma", "ababab\t120"]


def test_pcall_error_and_budget():
    out = run("""
local ok, err = pcall(error, {code = 42})
print(ok, type(err), err.code)
local ok2, err2 = pcall(function() local x = nil .. "s" end)
print(ok2)
""")
    assert out == ["false\ttable\t42", "false"]
    with pytest.raises(ScriptBudgetExceeded):
        run("while true do end", budget=5_000)


def test_sandbox_no_io():
    ip = Interpreter()
    assert ip.globals.get("io") is None
    assert ip.globals.get("load") is None
    assert ip.globals.get("loadstring") is None
    assert ip.globals.get("require") is None
    assert ip.globals.get("dofile") is None
    os_tbl = ip.globals.get("os")
    assert os_tbl.get("execute") is None and os_tbl.get("remove") is None


def test_number_formatting_matches_lua():
    assert run("print(1, 1.5, 2/1, 1e3, 0x10)") == ["1\t1.5\t2\t1000\t16"]


# ---------------------------------------------------------------------------
# Substrata bindings
# ---------------------------------------------------------------------------

class FakeWorld:
    def __init__(self):
        self.objects = {}
        self.modified = []

    def object_modified(self, ob):
        self.modified.append(ob.uid)


def make_vm(now=[0.0]):
    w = FakeWorld()
    vm = ScriptVM(world_interface=w, clock=lambda: now[0])
    return vm, w, now


def test_lua_script_event_handlers_and_this_object():
    vm, w, now = make_vm()
    ob = WorldObject(uid=7, model_url="m.glb")
    ob.pos = np.array([1.0, 2.0, 3.0])
    w.objects[7] = ob
    ev = vm.run_script("""--lua
touches = 0
addEventListener("onUserTouchedObject", this_object.uid, function(av, ob)
  touches = touches + 1
  last_av_uid = av.uid
  last_ob_pos_z = ob.pos.z
end)
""", this_object=ob)
    assert not ev.hit_error
    vm.fire_user_touched_object(7, avatar_uid=55)
    vm.fire_user_touched_object(7, avatar_uid=56)
    g = ev.interp.globals
    assert g.get("touches") == 2.0
    assert g.get("last_av_uid") == 56.0
    assert g.get("last_ob_pos_z") == 3.0


def test_lua_object_proxy_write_marks_modified():
    vm, w, now = make_vm()
    ob = WorldObject(uid=3)
    w.objects[3] = ob
    vm.run_script("""--lua
local ob = getObjectForUID(3)
ob.model_url = "new.glb"
ob.pos = {x = 5, y = 6, z = 7}
ob.mass = 12.5
""", this_object=ob)
    assert ob.model_url == "new.glb"
    assert np.allclose(ob.pos, [5, 6, 7])
    assert ob.mass == 12.5
    assert w.modified == [3, 3, 3]


def test_lua_timers_fire_and_limit():
    vm, w, now = make_vm()
    ob = WorldObject(uid=1)
    ev = vm.run_script("""--lua
fires = 0
h = createTimer(function() fires = fires + 1 end, 0.5, true)
""", this_object=ob)
    now[0] = 0.6
    vm.update()
    now[0] = 1.2
    vm.update()
    assert ev.interp.globals.get("fires") == 2.0
    # destroyTimer stops it
    ev.interp.run("destroyTimer(h)")
    now[0] = 2.0
    vm.update()
    assert ev.interp.globals.get("fires") == 2.0
    # max 4 timers per script (LuaScriptEvaluator::MAX_NUM_TIMERS)
    with pytest.raises(ScriptExecutionError, match="4 timers"):
        vm.run_script("""--lua
for i = 1, 5 do createTimer(function() end, 1, true) end
""", this_object=ob)


def test_lua_objectstorage_and_json():
    vm, w, now = make_vm()
    ev = vm.run_script("""--lua
objectstorage.setItem("score", {points = 10, name = "zed"})
local v = objectstorage.getItem("score")
roundtrip = v.points
local parsed = parseJSON('{"a": [1, 2, 3], "b": "str"}')
json_b = parsed.b
json_a2 = parsed.a[2]
""")
    g = ev.interp.globals
    assert g.get("roundtrip") == 10.0
    assert g.get("json_b") == "str"
    assert g.get("json_a2") == 2.0
    assert vm.object_storage["score"]["points"] == 10.0


def test_lua_handler_error_latches_script():
    vm, w, now = make_vm()
    ob = WorldObject(uid=4)
    w.objects[4] = ob
    ev = vm.run_script("""--lua
calls = 0
addEventListener("onUserUsedObject", 4, function()
  calls = calls + 1
  error("handler boom")
end)
""", this_object=ob)
    vm.fire_user_used_object(4, avatar_uid=1)
    vm.fire_user_used_object(4, avatar_uid=1)   # latched: no second call
    assert ev.interp.globals.get("calls") == 1.0
    assert ev.hit_error
    assert "boom" in ev.error_messages[0]


def test_python_dialect_still_works():
    vm, w, now = make_vm()
    env = vm.run_script("x = 1 + 1")
    assert env["x"] == 2
