"""Batched pure-function object animation: the Winter-script equivalent.

The reference JIT-compiles Winter scripts (an LLVM-backed pure functional
language) to native evalRotation(time, env) / evalTranslation(time, env)
function pointers (gui_client/WinterShaderEvaluator.h:38-50) and evaluates
them for every scripted object per tick in parallel task groups
(Scripting.cpp:735-880), producing ob_to_world transforms + AABBs.

Scripts are pure f(time) -> vec — exactly a vmappable jax function
(SURVEY.md §2.7) — so here a script compiles to a jax expression evaluated
for ALL scripted objects in one jitted batch: the "JIT" is XLA itself.

Script source is a small pure expression language (Winter's surface for
these hooks), e.g.:

    def evalRotation(float time, WinterEnv env) vec3 :
        vec3(0.0, 0.0, time * 0.3)

    def evalTranslation(float time, WinterEnv env) vec3 :
        vec3(0.0, 0.0, sin(time * 2.0) * 0.5)

evalRotation returns an axis-angle vector (axis * angle); evalTranslation a
world-space offset (WinterShaderEvaluator semantics).  Supported: float
literals, + - * / %, sin cos tan sqrt abs floor fract pow min max clamp
lerp, time, env.instance_index / env.num_instances (instanced scripts).
"""

from __future__ import annotations

import ast
import math
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

_ALLOWED_FUNCS = {
    "sin": jnp.sin, "cos": jnp.cos, "tan": jnp.tan, "sqrt": jnp.sqrt,
    "abs": jnp.abs, "floor": jnp.floor, "pow": jnp.power,
    "min": jnp.minimum, "max": jnp.maximum,
    "fract": lambda x: x - jnp.floor(x),
    "clamp": lambda x, a, b: jnp.clip(x, a, b),
    "lerp": lambda a, b, t: a + (b - a) * t,
    "mod": jnp.mod,
}


class WinterParseError(Exception):
    pass


def _parse_function(src: str, name: str):
    """Extract the expression body of `def <name>(...) vec3 : <expr>`."""
    marker = f"def {name}"
    i = src.find(marker)
    if i < 0:
        return None
    # Body = everything after the first ':' following the signature, up to
    # the next 'def ' or end.
    colon = src.find(":", i)
    if colon < 0:
        raise WinterParseError(f"missing ':' in {name}")
    end = src.find("def ", colon)
    body = src[colon + 1:end if end > 0 else len(src)].strip()
    # Winter vec3 literal forms: vec3(a, b, c) or [a, b, c]vec3.
    body = body.replace("]vec3", "]")
    return body


def _compile_expr(expr_src: str):
    """Compile a restricted expression to a jax-traceable fn(time, idx, n)."""
    tree = ast.parse(expr_src, mode="eval")

    def check(node):
        if isinstance(node, (ast.Expression, ast.BinOp, ast.UnaryOp,
                             ast.Constant, ast.List, ast.Tuple, ast.Load,
                             ast.Add, ast.Sub, ast.Mult, ast.Div, ast.Mod,
                             ast.Pow, ast.USub, ast.UAdd, ast.Compare,
                             ast.IfExp, ast.Lt, ast.Gt, ast.LtE, ast.GtE)):
            pass
        elif isinstance(node, ast.Call):
            if not (isinstance(node.func, ast.Name)
                    and node.func.id in (*_ALLOWED_FUNCS, "vec3")):
                raise WinterParseError(f"call to {ast.dump(node.func)} not allowed")
        elif isinstance(node, ast.Name):
            if node.id not in ("time", "vec3", "env", *_ALLOWED_FUNCS):
                raise WinterParseError(f"unknown name {node.id}")
        elif isinstance(node, ast.Attribute):
            if not (isinstance(node.value, ast.Name) and node.value.id == "env"
                    and node.attr in ("instance_index", "num_instances")):
                raise WinterParseError(f"attribute {node.attr} not allowed")
        else:
            raise WinterParseError(f"node {type(node).__name__} not allowed")
        for child in ast.iter_child_nodes(node):
            check(child)

    check(tree)
    code = compile(tree, "<winter>", "eval")

    def fn(time, instance_index=0.0, num_instances=1.0):
        env = type("E", (), {"instance_index": instance_index,
                             "num_instances": num_instances})
        ns = dict(_ALLOWED_FUNCS)
        ns.update(time=time, env=env,
                  vec3=lambda a, b, c: jnp.stack([jnp.asarray(a, jnp.float32) + 0 * time,
                                                  jnp.asarray(b, jnp.float32) + 0 * time,
                                                  jnp.asarray(c, jnp.float32) + 0 * time], -1))
        out = eval(code, {"__builtins__": {}}, ns)
        if isinstance(out, (list, tuple)):
            out = jnp.stack([jnp.asarray(v, jnp.float32) + 0 * time for v in out], -1)
        return out

    return fn


class WinterScriptEvaluator:
    """Per-script compiled evaluator (WinterShaderEvaluator parity)."""

    def __init__(self, src: str):
        self.src = src
        rot = _parse_function(src, "evalRotation")
        trans = _parse_function(src, "evalTranslation")
        if rot is None and trans is None:
            raise WinterParseError("script defines neither evalRotation nor evalTranslation")
        self.rot_fn = _compile_expr(rot) if rot else None
        self.trans_fn = _compile_expr(trans) if trans else None

    def eval_rotation(self, time, instance_index=0.0, num_instances=1.0):
        """Axis*angle vector [..., 3]."""
        if self.rot_fn is None:
            return jnp.zeros(jnp.shape(time) + (3,))
        return self.rot_fn(jnp.asarray(time, jnp.float32),
                           instance_index, num_instances)

    def eval_translation(self, time, instance_index=0.0, num_instances=1.0):
        if self.trans_fn is None:
            return jnp.zeros(jnp.shape(time) + (3,))
        return self.trans_fn(jnp.asarray(time, jnp.float32),
                             instance_index, num_instances)


@dataclass
class ScriptedObject:
    evaluator: WinterScriptEvaluator
    world_object: object
    num_instances: int = 1


class ObjectScriptsEvaluator:
    """Evaluate every scripted object at one global time in a single jitted
    batch (replacing the task-group parallel eval, Scripting.cpp:735-880).

    Objects sharing a script source batch via vmap over instance indices;
    different scripts evaluate in the same XLA program (they are all traced
    into one jit since script set changes rarely -> recompile on change).
    """

    def __init__(self):
        self.scripted: list[ScriptedObject] = []
        self._cache_key = None
        self._batched_fn = None

    def add(self, ob, src: str, num_instances: int = 1):
        self.scripted.append(ScriptedObject(WinterScriptEvaluator(src), ob,
                                            num_instances))

    def remove(self, ob):
        self.scripted = [s for s in self.scripted if s.world_object is not ob]

    def _build(self):
        evals = [(s.evaluator, s.num_instances) for s in self.scripted]

        def run(time):
            rots, trans = [], []
            for ev, n in evals:
                idx = jnp.arange(max(n, 1), dtype=jnp.float32)
                rots.append(ev.eval_rotation(
                    jnp.broadcast_to(time, idx.shape), idx, float(max(n, 1))))
                trans.append(ev.eval_translation(
                    jnp.broadcast_to(time, idx.shape), idx, float(max(n, 1))))
            if not rots:
                return jnp.zeros((0, 3)), jnp.zeros((0, 3))
            return jnp.concatenate(rots), jnp.concatenate(trans)

        self._batched_fn = jax.jit(run)
        self._cache_key = tuple(id(s.evaluator) for s in self.scripted)

    def evaluate(self, global_time: float):
        """Returns list of (world_object, axis_angle [n,3], translation [n,3])
        — the WinterScriptEvalOutput equivalent (Scripting.h:199-206)."""
        key = tuple(id(s.evaluator) for s in self.scripted)
        if key != self._cache_key:
            self._build()
        rots, trans = self._batched_fn(jnp.float32(global_time))
        rots = np.asarray(rots)
        trans = np.asarray(trans)
        out = []
        i = 0
        for s in self.scripted:
            n = max(s.num_instances, 1)
            out.append((s.world_object, rots[i:i + n], trans[i:i + n]))
            i += n
        return out
