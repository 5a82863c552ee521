"""Batched object animation scripts: a Winter-language front-end for jax.

The reference JIT-compiles Winter scripts (an LLVM-backed pure functional
language, see resources/winter_stdlib.txt for its stdlib surface) to native
evalRotation(time, env) / evalTranslation(time, env) function pointers
(gui_client/WinterShaderEvaluator.h:38-50) and evaluates them for every
scripted object per tick in parallel task groups (Scripting.cpp:735-880),
producing ob_to_world transforms + AABBs.

Scripts are pure f(time, env) -> vec — exactly a vmappable jax function
(SURVEY.md §2.7) — so here each script source compiles ONCE to a
jax-traceable closure and all objects sharing that source evaluate in a
single jitted batch over their instance indices; the "JIT" is XLA itself.
Batches are padded to power-of-two shape buckets so adding/removing scripted
objects almost never recompiles (the reference evaluates thousands of
scripted objects; Scripting.cpp:735-821).

Language surface supported (the subset real substrata scripts use — see
testfiles/*.win and winter_stdlib.txt):

- `def name(type arg, ...) [rettype] : expr` — including user helper
  functions called from the eval hooks (testfiles/spacetime_bounds_test.win)
  with arity overloading.
- `let  a = expr  b = expr  in  expr` blocks (multi-binding, optional type
  annotations on bindings).
- `if(cond, a, b)` conditional function (Winter's conditional surface).
- operators + - * / % == != < <= > >= && || unary- on scalars and vecs.
- vec2/vec3/vec4 construction (`vec3(x,y,z)`, splat `vec3(x)`, literal
  `[x, y, z]v` / `[x, y, z]vec3`), component access `x(v)`/`e0(v)`/`v.x`,
  dot/cross/length/normalise/lerp/clamp and the rest of the stdlib math.
- `struct Name { type field, ... }` with constructor + field access.
- int/float literals (`1`, `2.0`, `3.0f`), `true`/`false`, `toFloat`,
  `truncateToInt`, `pi()`, `env.instance_index` / `env.num_instances`.

evalRotation returns an axis-angle vector (axis * angle); evalTranslation a
world-space offset (WinterShaderEvaluator semantics).
"""

from __future__ import annotations

import math
import re
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np


class WinterParseError(Exception):
    pass


# ---------------------------------------------------------------- lexer

_TOKEN_RE = re.compile(r"""
    (?P<ws>[\s]+)
  | (?P<comment>\#[^\n]*)
  | (?P<float>(?:\d+\.\d*|\.\d+)(?:[eE][+-]?\d+)?f?|\d+[eE][+-]?\d+f?|\d+f)
  | (?P<int>\d+)
  | (?P<ident>[A-Za-z_][A-Za-z0-9_]*)
  | (?P<op>==|!=|<=|>=|&&|\|\||[-+*/%<>=(),:.\[\]{}!])
""", re.VERBOSE)

_KEYWORDS = {"def", "let", "in", "struct", "true", "false"}


@dataclass
class _Tok:
    kind: str   # 'float' | 'int' | 'ident' | 'op' | 'kw' | 'eof'
    text: str
    pos: int


def _tokenize(src: str) -> list[_Tok]:
    toks, i = [], 0
    while i < len(src):
        m = _TOKEN_RE.match(src, i)
        if m is None:
            raise WinterParseError(f"bad character {src[i]!r} at offset {i}")
        i = m.end()
        kind = m.lastgroup
        if kind in ("ws", "comment"):
            continue
        text = m.group()
        if kind == "ident" and text in _KEYWORDS:
            kind = "kw"
        toks.append(_Tok(kind, text, m.start()))
    toks.append(_Tok("eof", "", len(src)))
    return toks


# ---------------------------------------------------------------- AST

@dataclass
class _Num:
    value: float
    is_int: bool

@dataclass
class _Bool:
    value: bool

@dataclass
class _Var:
    name: str

@dataclass
class _Call:
    name: str
    args: list

@dataclass
class _Field:
    base: object
    name: str

@dataclass
class _BinOp:
    op: str
    left: object
    right: object

@dataclass
class _UnaryOp:
    op: str
    operand: object

@dataclass
class _Let:
    bindings: list          # [(name, expr), ...]
    body: object

@dataclass
class _VecLit:
    elems: list             # [expr, ...]; `[a,b,c]v` / `[a,b,c]vec3`

@dataclass
class _FuncDef:
    name: str
    params: list            # [(type, name), ...]
    body: object

@dataclass
class _StructDef:
    name: str
    fields: list            # [name, ...]


class _Parser:
    """Recursive-descent parser for the Winter surface above."""

    def __init__(self, toks: list[_Tok]):
        self.toks = toks
        self.i = 0

    def peek(self) -> _Tok:
        return self.toks[self.i]

    def next(self) -> _Tok:
        t = self.toks[self.i]
        self.i += 1
        return t

    def expect(self, kind: str, text: str | None = None) -> _Tok:
        t = self.next()
        if t.kind != kind or (text is not None and t.text != text):
            raise WinterParseError(
                f"expected {text or kind}, got {t.text!r} at offset {t.pos}")
        return t

    def at(self, kind: str, text: str | None = None) -> bool:
        t = self.peek()
        return t.kind == kind and (text is None or t.text == text)

    # ---- top level: a sequence of struct and def items
    def parse_program(self) -> list:
        items = []
        while not self.at("eof"):
            if self.at("kw", "struct"):
                items.append(self.parse_struct())
            elif self.at("kw", "def"):
                items.append(self.parse_def())
            else:
                t = self.peek()
                raise WinterParseError(
                    f"expected 'def' or 'struct', got {t.text!r} at {t.pos}")
        return items

    def parse_struct(self) -> _StructDef:
        self.expect("kw", "struct")
        name = self.expect("ident").text
        self.expect("op", "{")
        fields = []
        while not self.at("op", "}"):
            self._parse_type()                       # field type (ignored)
            fields.append(self.expect("ident").text)
            if self.at("op", ","):
                self.next()
        self.expect("op", "}")
        return _StructDef(name, fields)

    def _parse_type(self):
        """Consume a type name, incl. generics like vector<real, 4>."""
        self.expect("ident")
        if self.at("op", "<"):
            depth = 0
            while True:
                t = self.next()
                if t.kind == "op" and t.text == "<":
                    depth += 1
                elif t.kind == "op" and t.text == ">":
                    depth -= 1
                    if depth == 0:
                        break
                elif t.kind == "eof":
                    raise WinterParseError("unterminated generic type")

    def parse_def(self) -> _FuncDef:
        self.expect("kw", "def")
        name = self.expect("ident").text
        self.expect("op", "(")
        params = []
        while not self.at("op", ")"):
            tname = self.expect("ident").text          # param type
            if self.at("op", "<"):                     # generic param type
                self.i -= 1
                self._parse_type()
                tname = "vector"
            pname = self.expect("ident").text
            params.append((tname, pname))
            if self.at("op", ","):
                self.next()
        self.expect("op", ")")
        if self.at("ident"):                           # optional return type
            self._parse_type()
        self.expect("op", ":")
        body = self.parse_expr()
        return _FuncDef(name, params, body)

    # ---- expressions, lowest precedence first
    def parse_expr(self):
        if self.at("kw", "let"):
            return self.parse_let()
        return self.parse_or()

    def parse_let(self) -> _Let:
        self.expect("kw", "let")
        bindings = []
        while not self.at("kw", "in"):
            # optional type annotation: `let real x = ...` / `let x = ...`
            name = self.expect("ident").text
            if self.at("ident"):                       # first ident was a type
                name = self.expect("ident").text
            self.expect("op", "=")
            bindings.append((name, self.parse_or()))
        self.expect("kw", "in")
        body = self.parse_expr()
        return _Let(bindings, body)

    def parse_or(self):
        left = self.parse_and()
        while self.at("op", "||"):
            self.next()
            left = _BinOp("||", left, self.parse_and())
        return left

    def parse_and(self):
        left = self.parse_cmp()
        while self.at("op", "&&"):
            self.next()
            left = _BinOp("&&", left, self.parse_cmp())
        return left

    def parse_cmp(self):
        left = self.parse_add()
        while self.peek().kind == "op" and self.peek().text in (
                "==", "!=", "<", "<=", ">", ">="):
            op = self.next().text
            left = _BinOp(op, left, self.parse_add())
        return left

    def parse_add(self):
        left = self.parse_mul()
        while self.peek().kind == "op" and self.peek().text in ("+", "-"):
            op = self.next().text
            left = _BinOp(op, left, self.parse_mul())
        return left

    def parse_mul(self):
        left = self.parse_unary()
        while self.peek().kind == "op" and self.peek().text in ("*", "/", "%"):
            op = self.next().text
            left = _BinOp(op, left, self.parse_unary())
        return left

    def parse_unary(self):
        if self.at("op", "-"):
            self.next()
            return _UnaryOp("-", self.parse_unary())
        if self.at("op", "!"):
            self.next()
            return _UnaryOp("!", self.parse_unary())
        return self.parse_postfix()

    def parse_postfix(self):
        e = self.parse_primary()
        while True:
            if self.at("op", "."):
                self.next()
                e = _Field(e, self.expect("ident").text)
            elif self.at("op", "["):                   # index: v[i] (const)
                self.next()
                idx = self.parse_expr()
                self.expect("op", "]")
                e = _Call("__index", [e, idx])
            else:
                return e

    def parse_primary(self):
        t = self.peek()
        if t.kind == "float":
            self.next()
            return _Num(float(t.text.rstrip("f")), is_int=False)
        if t.kind == "int":
            self.next()
            return _Num(int(t.text), is_int=True)
        if t.kind == "kw" and t.text in ("true", "false"):
            self.next()
            return _Bool(t.text == "true")
        if t.kind == "op" and t.text == "(":
            self.next()
            e = self.parse_expr()
            self.expect("op", ")")
            return e
        if t.kind == "op" and t.text == "[":           # vector literal
            self.next()
            elems = []
            while not self.at("op", "]"):
                elems.append(self.parse_expr())
                if self.at("op", ","):
                    self.next()
            self.expect("op", "]")
            # suffix: `v`, `vec3`, `vec4`... (required by Winter; we accept
            # its absence too)
            if self.at("ident") and self.peek().text in (
                    "v", "vec2", "vec3", "vec4"):
                self.next()
            return _VecLit(elems)
        if t.kind == "ident":
            self.next()
            if self.at("op", "("):
                self.next()
                args = []
                while not self.at("op", ")"):
                    args.append(self.parse_expr())
                    if self.at("op", ","):
                        self.next()
                self.expect("op", ")")
                return _Call(t.text, args)
            return _Var(t.text)
        raise WinterParseError(f"unexpected token {t.text!r} at offset {t.pos}")


# ------------------------------------------------------------ evaluation
#
# Values at trace time:
#   scalar  -> jnp array (float32 / int32 / bool), any batch shape
#   vecN    -> Vec(arr) with arr.shape[-1] == N
#   struct  -> dict {field: value}  (env is one of these)

class Vec:
    __slots__ = ("arr",)

    def __init__(self, arr):
        self.arr = arr

    @property
    def n(self):
        return self.arr.shape[-1]


def _f(x):
    return jnp.asarray(x, jnp.float32)


def _broadcast_elems(elems):
    """Stack scalar elems (mixed python/array) into a Vec array."""
    arrs = [e.arr if isinstance(e, Vec) else jnp.asarray(e, jnp.float32)
            for e in elems]
    shape = jnp.broadcast_shapes(*[a.shape for a in arrs])
    return jnp.stack([jnp.broadcast_to(a, shape) for a in arrs], -1)


def _make_vec(n):
    def ctor(*args):
        if len(args) == 1 and isinstance(args[0], Vec):
            a = args[0].arr
            if a.shape[-1] >= n:
                return Vec(a[..., :n])
            pad = [(0, 0)] * (a.ndim - 1) + [(0, n - a.shape[-1])]
            return Vec(jnp.pad(a, pad))
        if len(args) == 1:                              # splat vecN(x)
            return Vec(jnp.stack([_f(args[0])] * n, -1))
        if len(args) != n:
            raise WinterParseError(f"vec{n} expects 1 or {n} args")
        return Vec(_broadcast_elems(args))
    return ctor


def _comp(i):
    def get(v):
        if isinstance(v, Vec):
            return v.arr[..., i]
        raise WinterParseError(f"e{i}() on non-vector")
    return get


def _unwrap(x):
    return x.arr if isinstance(x, Vec) else x


def _vec_map(fn):
    """Lift an elementwise fn over scalars and Vecs."""
    def apply(*args):
        if any(isinstance(a, Vec) for a in args):
            return Vec(fn(*[_unwrap(a) for a in args]))
        return fn(*args)
    return apply


def _dot(a, b):
    return jnp.sum(a.arr * b.arr, -1)


def _length(a):
    return jnp.sqrt(_dot(a, a))


def _cross(a, b):
    av, bv = a.arr[..., :3], b.arr[..., :3]
    return Vec(jnp.cross(av, bv))


def _if(c, a, b):
    if isinstance(a, Vec) or isinstance(b, Vec):
        av, bv = _unwrap(a), _unwrap(b)
        return Vec(jnp.where(jnp.asarray(c)[..., None], av, bv))
    return jnp.where(c, a, b)


def _noise1(x):
    """Cheap value-noise stand-in for Winter's built-in noise(): smooth,
    deterministic, zero-mean-ish. Not Perlin-exact (the reference links its
    own noise impl); scripts only need plausible smooth variation."""
    if isinstance(x, Vec):
        ws = [12.9898, 78.233, 37.719, 9.151][:x.n]
        x = sum(x.arr[..., i] * w for i, w in enumerate(ws))
    x = _f(x)
    i = jnp.floor(x)
    t = x - i
    t = t * t * (3.0 - 2.0 * t)

    def h(k):
        return jnp.sin(k * 127.1 + 311.7) * 43758.5453 % 2.0 - 1.0
    return h(i) * (1 - t) + h(i + 1.0) * t


def _fbm(x, octaves):
    try:
        octs = int(octaves)
    except TypeError:                     # traced count -> fixed 4 octaves
        octs = 4
    acc, amp, freq = 0.0, 0.5, 1.0
    for _ in range(max(1, min(octs, 8))):
        xs = Vec(x.arr * freq) if isinstance(x, Vec) else _f(x) * freq
        acc = acc + amp * _noise1(xs)
        amp, freq = amp * 0.5, freq * 2.0
    return acc


def _index(v, i):
    if isinstance(v, Vec):
        idx = jnp.asarray(i, jnp.int32)
        return jnp.take(v.arr, idx, axis=-1)
    raise WinterParseError("indexing on non-vector")


_BUILTINS = {
    "sin": _vec_map(jnp.sin), "cos": _vec_map(jnp.cos),
    "tan": _vec_map(jnp.tan), "asin": _vec_map(jnp.arcsin),
    "acos": _vec_map(jnp.arccos), "atan": _vec_map(jnp.arctan),
    "atan2": _vec_map(jnp.arctan2),
    "sqrt": _vec_map(jnp.sqrt), "abs": _vec_map(jnp.abs),
    "exp": _vec_map(jnp.exp), "log": _vec_map(jnp.log),
    "floor": _vec_map(jnp.floor), "ceil": _vec_map(jnp.ceil),
    "pow": _vec_map(jnp.power), "mod": _vec_map(jnp.mod),
    "min": _vec_map(jnp.minimum), "max": _vec_map(jnp.maximum),
    "fract": _vec_map(lambda x: x - jnp.floor(x)),
    "clamp": _vec_map(lambda x, a, b: jnp.clip(x, a, b)),
    "lerp": _vec_map(lambda a, b, t: a + (b - a) * t),
    "step": _vec_map(lambda edge, x: jnp.where(x >= edge, 1.0, 0.0)),
    "smoothstep": _vec_map(lambda a, b, x: jnp.where(
        x < a, 0.0, jnp.where(
            x >= b, 1.0,
            ((x - a) / (b - a)) ** 2 * (3.0 - 2.0 * (x - a) / (b - a))))),
    "smootherstep": _vec_map(lambda a, b, x: jnp.where(
        x < a, 0.0, jnp.where(
            x >= b, 1.0,
            ((x - a) / (b - a)) ** 3
            * (((x - a) / (b - a)) * (((x - a) / (b - a)) * 6.0 - 15.0)
               + 10.0)))),
    "pulse": _vec_map(
        lambda a, b, x: jnp.where((x < a) | (x > b), 0.0, 1.0)),
    "toFloat": _vec_map(lambda x: jnp.asarray(x, jnp.float32)),
    "real": _vec_map(lambda x: jnp.asarray(x, jnp.float32)),
    "toInt": _vec_map(lambda x: jnp.asarray(x, jnp.int32)),
    "truncateToInt": _vec_map(
        lambda x: jnp.trunc(x).astype(jnp.int32)),
    "floorToInt": _vec_map(lambda x: jnp.floor(x).astype(jnp.int32)),
    "ceilToInt": _vec_map(lambda x: jnp.ceil(x).astype(jnp.int32)),
    "neg": _vec_map(lambda x: -x), "recip": _vec_map(lambda x: 1.0 / x),
    "pi": lambda: jnp.float32(math.pi),
    "if": _if,
    "vec2": _make_vec(2), "vec3": _make_vec(3), "vec4": _make_vec(4),
    "x": _comp(0), "y": _comp(1), "z": _comp(2), "w": _comp(3),
    "e0": _comp(0), "e1": _comp(1), "e2": _comp(2), "e3": _comp(3),
    "doti": _comp(0), "dotj": _comp(1), "dotk": _comp(2),
    "dot": _dot, "cross": _cross,
    "length": _length, "length2": lambda a: _dot(a, a),
    "dist": lambda a, b: _length(Vec(a.arr - b.arr)),
    "normalise": lambda a: Vec(a.arr / _length(a)[..., None]),
    "normalize": lambda a: Vec(a.arr / _length(a)[..., None]),
    "and": _vec_map(jnp.logical_and), "or": _vec_map(jnp.logical_or),
    "not": _vec_map(jnp.logical_not),
    "xor": _vec_map(jnp.logical_xor),
    "noise": _noise1, "noise01": lambda x: (_noise1(x) + 1.0) * 0.5,
    "fbm": _fbm,
    "__index": _index,
    # backwards-compat arithmetic names (stdlib tail)
    "add": _vec_map(lambda a, b: a + b), "sub": _vec_map(lambda a, b: a - b),
    "mul": None,                                       # handled via _binop '*'
    "div": _vec_map(lambda a, b: a / b),
    "lt": _vec_map(lambda a, b: a < b), "lte": _vec_map(lambda a, b: a <= b),
    "gt": _vec_map(lambda a, b: a > b), "gte": _vec_map(lambda a, b: a >= b),
    "eq": _vec_map(lambda a, b: a == b),
    "neq": _vec_map(lambda a, b: a != b),
}


def _binop(op, a, b):
    if op in ("&&", "||"):
        fn = jnp.logical_and if op == "&&" else jnp.logical_or
        return fn(jnp.asarray(_unwrap(a), bool), jnp.asarray(_unwrap(b), bool))
    va, vb = isinstance(a, Vec), isinstance(b, Vec)
    if va or vb:
        if va and vb:
            la, lb = a.arr, b.arr
        elif va:
            la, lb = a.arr, jnp.asarray(_f(b))[..., None]
        else:
            la, lb = jnp.asarray(_f(a))[..., None], b.arr
        if op == "+":
            return Vec(la + lb)
        if op == "-":
            return Vec(la - lb)
        if op == "*":
            return Vec(la * lb)
        if op == "/":
            return Vec(la / lb)
        if op == "==":
            return jnp.all(la == lb, -1)
        if op == "!=":
            return ~jnp.all(la == lb, -1)
        raise WinterParseError(f"operator {op} not defined on vectors")
    if op == "+":
        return a + b
    if op == "-":
        return a - b
    if op == "*":
        return a * b
    if op == "/":
        return a / b
    if op == "%":
        return jnp.mod(a, b)
    if op == "==":
        return a == b
    if op == "!=":
        return a != b
    if op == "<":
        return a < b
    if op == "<=":
        return a <= b
    if op == ">":
        return a > b
    if op == ">=":
        return a >= b
    raise WinterParseError(f"unknown operator {op}")


_MAX_CALL_DEPTH = 64


class _Program:
    """Parsed script: user defs (by name) + struct defs."""

    def __init__(self, src: str):
        items = _Parser(_tokenize(src)).parse_program()
        self.funcs: dict[str, list[_FuncDef]] = {}
        self.structs: dict[str, _StructDef] = {}
        for it in items:
            if isinstance(it, _FuncDef):
                self.funcs.setdefault(it.name, []).append(it)
            else:
                self.structs[it.name] = it
        for fns in self.funcs.values():
            for f in fns:
                self._validate(f.body, {n for _t, n in f.params})

    def _validate(self, node, bound: set):
        """Parse-time name resolution: every call target and variable must be
        a builtin, user def, struct, or bound name — rejects injection
        attempts (and typos) before any evaluation happens."""
        if isinstance(node, _Var):
            if node.name not in bound:
                raise WinterParseError(f"unknown name {node.name!r}")
        elif isinstance(node, _Call):
            if (node.name not in _BUILTINS and node.name not in self.funcs
                    and node.name not in self.structs):
                raise WinterParseError(f"call to {node.name!r} not allowed")
            for a in node.args:
                self._validate(a, bound)
        elif isinstance(node, _Let):
            inner = set(bound)
            for name, expr in node.bindings:
                self._validate(expr, inner)
                inner.add(name)
            self._validate(node.body, inner)
        elif isinstance(node, _BinOp):
            self._validate(node.left, bound)
            self._validate(node.right, bound)
        elif isinstance(node, _UnaryOp):
            self._validate(node.operand, bound)
        elif isinstance(node, _Field):
            self._validate(node.base, bound)
        elif isinstance(node, _VecLit):
            for e in node.elems:
                self._validate(e, bound)

    def lookup(self, name: str, nargs: int) -> _FuncDef | None:
        for f in self.funcs.get(name, ()):
            if len(f.params) == nargs:
                return f
        return None

    def eval(self, node, env: dict, depth: int = 0):
        if depth > _MAX_CALL_DEPTH:
            raise WinterParseError("call depth limit exceeded (recursion?)")
        if isinstance(node, _Num):
            return (jnp.int32(node.value) if node.is_int
                    else jnp.float32(node.value))
        if isinstance(node, _Bool):
            return jnp.asarray(node.value)
        if isinstance(node, _Var):
            if node.name not in env:
                raise WinterParseError(f"unknown name {node.name!r}")
            return env[node.name]
        if isinstance(node, _VecLit):
            return Vec(_broadcast_elems(
                [self.eval(e, env, depth) for e in node.elems]))
        if isinstance(node, _Let):
            inner = dict(env)
            for name, expr in node.bindings:
                inner[name] = self.eval(expr, inner, depth)
            return self.eval(node.body, inner, depth)
        if isinstance(node, _BinOp):
            return _binop(node.op,
                          self.eval(node.left, env, depth),
                          self.eval(node.right, env, depth))
        if isinstance(node, _UnaryOp):
            v = self.eval(node.operand, env, depth)
            if node.op == "-":
                return Vec(-v.arr) if isinstance(v, Vec) else -v
            return jnp.logical_not(_unwrap(v))
        if isinstance(node, _Field):
            base = self.eval(node.base, env, depth)
            if isinstance(base, dict):                 # struct field
                if node.name not in base:
                    raise WinterParseError(f"no field {node.name!r}")
                return base[node.name]
            if isinstance(base, Vec):                  # v.x swizzle sugar
                comp = {"x": 0, "y": 1, "z": 2, "w": 3}
                if node.name in comp and comp[node.name] < base.n:
                    return base.arr[..., comp[node.name]]
                if node.name == "v":
                    return base
            raise WinterParseError(f"field access .{node.name} not allowed")
        if isinstance(node, _Call):
            args = [self.eval(a, env, depth) for a in node.args]
            # user-defined functions shadow builtins (stdlib redefinitions)
            f = self.lookup(node.name, len(args))
            if f is not None:
                inner = {name: arg
                         for (_t, name), arg in zip(f.params, args)}
                return self.eval(f.body, inner, depth + 1)
            if node.name in self.structs:
                sd = self.structs[node.name]
                if len(args) != len(sd.fields):
                    raise WinterParseError(
                        f"struct {node.name} expects {len(sd.fields)} args")
                return dict(zip(sd.fields, args))
            if node.name == "mul":                     # polymorphic stdlib mul
                return _binop("*", *args)
            b = _BUILTINS.get(node.name)
            if b is None:
                raise WinterParseError(f"call to {node.name!r} not allowed")
            return b(*args)
        raise WinterParseError(f"bad node {type(node).__name__}")


def _as_vec3_arr(out, batch_shape):
    """Normalise an eval result to a float32 [..., 3] array."""
    if isinstance(out, Vec):
        a = _f(out.arr)
        if a.shape[-1] >= 3:
            a = a[..., :3]
        else:
            a = jnp.pad(a, [(0, 0)] * (a.ndim - 1) + [(0, 3 - a.shape[-1])])
    else:
        a = jnp.broadcast_to(_f(out)[..., None], batch_shape + (3,))
    return jnp.broadcast_to(a, batch_shape + (3,))


class WinterScriptEvaluator:
    """Per-script compiled evaluator (WinterShaderEvaluator parity:
    gui_client/WinterShaderEvaluator.h:38-50)."""

    def __init__(self, src: str):
        self.src = src
        self.program = _Program(src)
        self.has_rotation = self.program.lookup("evalRotation", 2) is not None
        self.has_translation = (
            self.program.lookup("evalTranslation", 2) is not None)
        if not (self.has_rotation or self.has_translation):
            raise WinterParseError(
                "script defines neither evalRotation nor evalTranslation")

    def _eval_hook(self, name, time, instance_index, num_instances):
        time = _f(time)
        batch = jnp.shape(time)
        f = self.program.lookup(name, 2)
        if f is None:
            return jnp.zeros(batch + (3,), jnp.float32)
        env = {"instance_index": jnp.asarray(instance_index, jnp.int32),
               "num_instances": jnp.asarray(num_instances, jnp.int32)}
        inner = {f.params[0][1]: time, f.params[1][1]: env}
        return _as_vec3_arr(self.program.eval(f.body, inner), batch)

    def eval_rotation(self, time, instance_index=0.0, num_instances=1.0):
        """Axis*angle vector [..., 3]."""
        return self._eval_hook("evalRotation", time,
                               instance_index, num_instances)

    def eval_translation(self, time, instance_index=0.0, num_instances=1.0):
        return self._eval_hook("evalTranslation", time,
                               instance_index, num_instances)


@dataclass
class ScriptedObject:
    evaluator: WinterScriptEvaluator
    world_object: object
    num_instances: int = 1


def _bucket(n: int) -> int:
    """Pad batch sizes to pow2 buckets (min 8) so adding/removing scripted
    objects reuses compiled programs instead of recompiling per count."""
    b = 8
    while b < n:
        b *= 2
    return b


class ObjectScriptsEvaluator:
    """Evaluate every scripted object at one global time, batched BY SCRIPT
    SOURCE (replacing the task-group parallel eval, Scripting.cpp:735-880).

    All objects sharing a source evaluate in one jitted call over their
    instance indices; compiled programs are cached by (source, bucket), so
    object add/remove only recompiles when a source's total instance count
    crosses a pow2 bucket boundary — no recompile storm at 1000s of scripted
    objects (the round-1 design retraced EVERY script on ANY change)."""

    def __init__(self):
        self.scripted: list[ScriptedObject] = []
        self._evaluators: dict[str, WinterScriptEvaluator] = {}
        self._jitted: dict[tuple[str, int], object] = {}

    def add(self, ob, src: str, num_instances: int = 1):
        ev = self._evaluators.get(src)
        if ev is None:
            ev = self._evaluators[src] = WinterScriptEvaluator(src)
        self.scripted.append(ScriptedObject(ev, ob, num_instances))

    def remove(self, ob):
        self.scripted = [s for s in self.scripted if s.world_object is not ob]

    def _get_jitted(self, src: str, bucket: int):
        key = (src, bucket)
        fn = self._jitted.get(key)
        if fn is None:
            ev = self._evaluators[src]

            def run(time, idx, n_inst):
                t = jnp.broadcast_to(time, idx.shape)
                return (ev.eval_rotation(t, idx, n_inst),
                        ev.eval_translation(t, idx, n_inst))

            fn = self._jitted[key] = jax.jit(run)
        return fn

    def evaluate(self, global_time: float):
        """Returns list of (world_object, axis_angle [n,3], translation [n,3])
        in add order — the WinterScriptEvalOutput equivalent
        (Scripting.h:199-206)."""
        by_src: dict[str, list[ScriptedObject]] = {}
        for s in self.scripted:
            by_src.setdefault(s.evaluator.src, []).append(s)

        results: dict[int, tuple] = {}
        t = jnp.float32(global_time)
        for src, group in by_src.items():
            counts = [max(s.num_instances, 1) for s in group]
            total = sum(counts)
            bucket = _bucket(total)
            idx = np.zeros(bucket, np.int32)
            n_inst = np.ones(bucket, np.int32)
            o = 0
            for s, c in zip(group, counts):
                idx[o:o + c] = np.arange(c)
                n_inst[o:o + c] = c
                o += c
            rots, trans = self._get_jitted(src, bucket)(
                t, jnp.asarray(idx), jnp.asarray(n_inst))
            rots = np.asarray(rots)
            trans = np.asarray(trans)
            o = 0
            for s, c in zip(group, counts):
                results[id(s)] = (s.world_object,
                                  rots[o:o + c], trans[o:o + c])
                o += c
        return [results[id(s)] for s in self.scripted]
