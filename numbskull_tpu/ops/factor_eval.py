"""Vectorized evaluation of all 25 factor functions.

TPU-native replacement for the reference's scalar if/elif chain
(reference: numbskull/inference.py:149-413). Instead of branching per
factor, every work item evaluates as masked reductions over a padded
argument axis; the per-type results are combined with ``jnp.select`` over
only the factor types *statically present* in the graph (the compiler
knows the type set, so absent types cost nothing).

The hypothetical-value substitution trick of the reference
(``value if fmap[l]['vid'] == var_samp else var_value[...]``,
reference numbskull/inference.py:163-165) becomes a masked select over the
argument axis performed by the caller; this module receives the already
substituted argument values.

Intentional deviation (bug fix, see golden.py): IMPLY_MLN /
IMPLY_NATURAL_CAT / IMPLY_MLN_CAT read the head through the head
*variable's* value rather than the reference's out-of-space
``var_value[l]`` slot index (reference numbskull/inference.py:242-243).
"""

from __future__ import annotations

import jax.numpy as jnp

from numbskull_tpu import types as T


def eval_factors(ftype, vals, eq, valid, card, arity, present_types):
    """Evaluate factors for a batch of work items.

    Args:
      ftype: (...,) int32 factor-function codes.
      vals:  (..., A) int32 argument values (hypothetical already
             substituted at active-arg positions).
      eq:    (..., A) int32 dense equal-to per argument.
      valid: (..., A) bool argument-padding mask.
      card:  (..., A) int32 cardinality of each argument's variable.
      arity: (...,) int32 true arity (head = argument arity-1).
      present_types: static iterable of factor codes present in the batch.

    Returns:
      (...,) float32 factor values; padding items (ftype==NOOP) yield 0.
    """
    A = vals.shape[-1]
    pos = jnp.arange(A, dtype=jnp.int32)
    head_idx = jnp.maximum(arity - 1, 0)[..., None]
    is_head = pos == head_idx
    body = valid & ~is_head

    one = jnp.float32(1.0)
    zero = jnp.float32(0.0)
    neg = jnp.float32(-1.0)

    def v_at(i):
        return vals[..., i]

    def head():
        return jnp.take_along_axis(vals, head_idx, axis=-1)[..., 0]

    def head_eq():
        return jnp.take_along_axis(eq, head_idx, axis=-1)[..., 0]

    def abstain(i):
        return card[..., i] - 1

    conds, outs = [], []

    def branch(code, fn):
        if code in present_types:
            conds.append(ftype == code)
            outs.append(fn())

    # --- boolean factor functions ---
    branch(T.FUNC_IMPLY_NATURAL, lambda: jnp.where(
        (valid & (vals == 0)).any(-1), zero,
        jnp.where(head() != 0, one, neg)))
    branch(T.FUNC_OR, lambda: jnp.where(
        (valid & (vals == 1)).any(-1), one, neg))
    branch(T.FUNC_EQUAL, lambda: jnp.where(
        (valid & (vals != v_at(0)[..., None])).any(-1), neg, one))
    branch(T.FUNC_AND, lambda: jnp.where(
        (valid & (vals == 0)).any(-1), neg, one))
    branch(T.FUNC_ISTRUE, lambda: jnp.where(
        (valid & (vals == 0)).any(-1), neg, one))
    branch(T.FUNC_LINEAR, lambda: (
        (body & (vals == head()[..., None])).sum(-1).astype(jnp.float32)))
    branch(T.FUNC_RATIO, lambda: jnp.log1p(
        (body & (vals == head()[..., None])).sum(-1).astype(jnp.float32)))
    branch(T.FUNC_LOGICAL, lambda: jnp.where(
        (body & (vals == head()[..., None])).any(-1), one, zero))
    branch(T.FUNC_IMPLY_MLN, lambda: jnp.where(
        (body & (vals == 0)).any(-1), one,
        jnp.where(head() != 0, one, zero)))

    # --- categorical factor functions ---
    branch(T.FUNC_AND_CAT, lambda: jnp.where(
        (valid & (vals != eq)).any(-1), zero, one))
    branch(T.FUNC_EQUAL_CAT_CONST, lambda: jnp.where(
        (valid & (vals != eq)).any(-1), zero, one))
    branch(T.FUNC_OR_CAT, lambda: jnp.where(
        (valid & (vals == eq)).any(-1), one, neg))
    branch(T.FUNC_IMPLY_NATURAL_CAT, lambda: jnp.where(
        (body & (vals != eq)).any(-1), zero,
        jnp.where(head() == head_eq(), one, neg)))
    branch(T.FUNC_IMPLY_MLN_CAT, lambda: jnp.where(
        (body & (vals != eq)).any(-1), one,
        jnp.where(head() == head_eq(), one, zero)))

    # --- data-programming generative-model factor functions ---
    branch(T.FUNC_DP_GEN_CLASS_PRIOR, lambda: jnp.where(
        v_at(0) == 1, one, neg))
    branch(T.FUNC_DP_GEN_LF_PRIOR, lambda: jnp.where(
        v_at(0) == 2, neg, jnp.where(v_at(0) == 0, zero, one)))
    branch(T.FUNC_DP_GEN_LF_PROPENSITY, lambda: jnp.where(
        v_at(0) == abstain(0), zero, one))
    if T.FUNC_DP_GEN_LF_ACCURACY in present_types:
        conds.append(ftype == T.FUNC_DP_GEN_LF_ACCURACY)
        y, l = v_at(0), v_at(1)
        outs.append(jnp.where(l == abstain(1), zero,
                              jnp.where(y == l, one, neg)))
    if T.FUNC_DP_GEN_LF_CLASS_PROPENSITY in present_types:
        conds.append(ftype == T.FUNC_DP_GEN_LF_CLASS_PROPENSITY)
        y, l = v_at(0), v_at(1)
        outs.append(jnp.where(l == abstain(1), zero,
                              jnp.where(y == 1, one, neg)))
    if T.FUNC_DP_GEN_DEP_FIXING in present_types:
        conds.append(ftype == T.FUNC_DP_GEN_DEP_FIXING)
        y, l1, l2 = v_at(0), v_at(1), v_at(2)
        outs.append(jnp.where(
            l1 == abstain(1), jnp.where(l2 != 1, neg, zero),
            jnp.where((l1 == 0) & (l2 == 1) & (y == 1), one,
                      jnp.where((l1 == 1) & (l2 == 0) & (y == 0), one,
                                zero))))
    if T.FUNC_DP_GEN_DEP_REINFORCING in present_types:
        conds.append(ftype == T.FUNC_DP_GEN_DEP_REINFORCING)
        y, l1, l2 = v_at(0), v_at(1), v_at(2)
        outs.append(jnp.where(
            l1 == abstain(1), jnp.where(l2 != 1, neg, zero),
            jnp.where((l1 == 0) & (l2 == 0) & (y == 0), one,
                      jnp.where((l1 == 1) & (l2 == 1) & (y == 1), one,
                                zero))))
    if T.FUNC_DP_GEN_DEP_EXCLUSIVE in present_types:
        conds.append(ftype == T.FUNC_DP_GEN_DEP_EXCLUSIVE)
        l1, l2 = v_at(0), v_at(1)
        ab = abstain(0)
        outs.append(jnp.where((l1 == ab) | (l2 == ab), zero, neg))
    branch(T.FUNC_DP_GEN_DEP_SIMILAR, lambda: jnp.where(
        v_at(0) == v_at(1), one, zero))

    # --- distributed-support factor (reference inference.py:398-405) ---
    if T.FUNC_UFO in present_types:
        conds.append(ftype == T.FUNC_UFO)
        v0 = v_at(0)
        idx = jnp.clip(v0 - 1, 0, A - 1)[..., None]
        at_v = jnp.take_along_axis(vals, idx, axis=-1)[..., 0]
        outs.append(jnp.where(v0 == 0, zero, at_v.astype(jnp.float32)))

    if not conds:
        return jnp.zeros(ftype.shape, jnp.float32)
    return jnp.select(conds, outs, zero)


def present_types_of(ftype_array) -> tuple[int, ...]:
    """Static set of factor codes in a (host) ftype array, NOOP excluded."""
    import numpy as np

    u = np.unique(np.asarray(ftype_array))
    return tuple(int(t) for t in u if t != T.FUNC_NOOP)
