"""Jit-compiled evaluator facade.

Wraps the pure functions in eval/evaluator.py in cached jax.jit entry points.
Each (op, chain_index, ct size, scale) combination compiles once: Ciphertext
metadata rides in the pytree aux treedef, so jit's signature cache handles
level dispatch automatically — the TPU-native replacement for the reference's
runtime chain_index branching (one static-shape XLA program per level, per
SURVEY.md section 7 design).
"""

from __future__ import annotations

from functools import partial

import jax

from ..scheme.context import FheContext
from ..scheme.keys import GaloisKey, RelinKey
from . import evaluator as ev
from ..ops.galois import conj_elt, galois_elt_from_step


class Evaluator:
    def __init__(self, ctx: FheContext):
        self.ctx = ctx
        c = ctx
        if ctx.is_q32:
            # q32 program boundary: outputs are canonical residues
            # (< 2^30) — compact their W64 hi planes away inside the
            # program so at-rest ciphertexts cost half the HBM
            from ..ops.w64 import compact_tree as _cp
        else:
            def _cp(x):
                return x
        self._add = jax.jit(lambda a, b: _cp(ev.add(c, a, b)))
        self._sub = jax.jit(lambda a, b: _cp(ev.sub(c, a, b)))
        self._negate = jax.jit(lambda a: _cp(ev.negate(c, a)))
        self._add_plain = jax.jit(lambda a, p: _cp(ev.add_plain(c, a, p)))
        self._sub_plain = jax.jit(lambda a, p: _cp(ev.sub_plain(c, a, p)))
        self._multiply = jax.jit(lambda a, b: _cp(ev.multiply(c, a, b)))
        self._multiply_plain = jax.jit(
            lambda a, p: _cp(ev.multiply_plain(c, a, p))
        )
        self._square = jax.jit(lambda a: _cp(ev.square(c, a)))
        self._relinearize = jax.jit(lambda a, k: _cp(ev.relinearize(c, a, k)))
        self._rescale = jax.jit(lambda a: _cp(ev.rescale_to_next(c, a)))
        self._mod_drop = jax.jit(lambda a: _cp(ev.mod_drop_to_next(c, a)))
        self._apply_galois = jax.jit(
            lambda a, k, elt: _cp(ev.apply_galois_with_key(c, a, elt, k)),
            static_argnums=(2,),
        )
        self._mul_relin = jax.jit(
            lambda a, b, k: _cp(ev.relinearize(c, ev.multiply(c, a, b), k))
        )
        self._square_relin = jax.jit(
            lambda a, k: _cp(ev.relinearize(c, ev.square(c, a), k))
        )

    # arithmetic ---------------------------------------------------------
    def add(self, a, b):
        return self._add(a, b)

    def sub(self, a, b):
        return self._sub(a, b)

    def negate(self, a):
        return self._negate(a)

    def add_plain(self, a, p):
        return self._add_plain(a, p)

    def sub_plain(self, a, p):
        return self._sub_plain(a, p)

    def multiply(self, a, b):
        return self._multiply(a, b)

    def multiply_plain(self, a, p):
        return self._multiply_plain(a, p)

    def square(self, a):
        return self._square(a)

    def relinearize(self, a, rlk: RelinKey):
        return self._relinearize(a, rlk)

    def multiply_relin(self, a, b, rlk: RelinKey):
        return self._mul_relin(a, b, rlk)

    def square_relin(self, a, rlk: RelinKey):
        return self._square_relin(a, rlk)

    def rescale(self, a):
        return self._rescale(a)

    def mod_drop(self, a):
        return self._mod_drop(a)

    # rotations ----------------------------------------------------------
    def rotate(self, a, step: int, gk: GaloisKey):
        elt = galois_elt_from_step(step, self.ctx.n)
        if elt == 1:
            return a
        return self._apply_galois(a, gk.key_for_elt(elt), elt)

    def conjugate(self, a, gk: GaloisKey):
        elt = conj_elt(self.ctx.n)
        return self._apply_galois(a, gk.key_for_elt(elt), elt)
