"""Bitwise integer kernels.

Capability mirror of /root/reference/arrow-arith/src/bitwise.rs:42-192:
and/or/xor/not + shifts, in array-array and array-scalar forms (the scalar
forms come free from arity's Datum broadcasting)."""

from __future__ import annotations

import jax.numpy as jnp

from . import arity


def bit_and(a, b):
    return arity.binary(a, b, jnp.bitwise_and)


def bit_or(a, b):
    return arity.binary(a, b, jnp.bitwise_or)


def bit_xor(a, b):
    return arity.binary(a, b, jnp.bitwise_xor)


def bit_not(a):
    return arity.unary(a, jnp.bitwise_not)


def shift_left(a, b):
    return arity.binary(a, b, jnp.left_shift)


def shift_right(a, b):
    return arity.binary(a, b, jnp.right_shift)
