"""Voting-style high-degree factor graphs.

Analog of the reference's degree-scaling experiment apps
(reference: experiments/intro/generate.py and
salt/src/experiment_intro_degree.py:9-88): boolean "vote" variables
connected by factors of controlled degree. Used to stress high-arity
factor evaluation and many-color chromatic schedules.
"""

from __future__ import annotations

import numpy as np

from numbskull_tpu import types as T


def voting_model(n_vars: int, n_factors: int, degree: int,
                 func: int = T.FUNC_OR, weight: float = 0.5,
                 n_weights: int = 1, fixed: bool = True, seed: int = 0,
                 evidence_frac: float = 0.0):
    """Random factors of arity `degree`+1 over boolean variables.

    Each factor picks `degree` distinct body variables plus a head.

    Returns (weight, variable, factor, fmap, domain_mask, edges).
    """
    rng = np.random.default_rng(seed)
    arity = degree + 1
    assert arity <= n_vars

    weights = T.new_weights(n_weights)
    weights["isFixed"] = fixed
    weights["initialValue"] = weight

    variables = T.new_variables(n_vars)
    variables["isEvidence"] = (
        rng.random(n_vars) < evidence_frac).astype(np.int8)
    variables["initialValue"] = rng.integers(0, 2, n_vars)
    variables["dataType"] = 0
    variables["cardinality"] = 2

    factors = T.new_factors(n_factors)
    factors["factorFunction"] = func
    factors["weightId"] = rng.integers(0, n_weights, n_factors)
    factors["featureValue"] = 1.0
    factors["arity"] = arity
    factors["ftv_offset"] = np.arange(n_factors, dtype=np.int64) * arity

    # vectorized distinct sampling: argsort random matrix, take first arity
    r = rng.random((n_factors, n_vars)).argsort(axis=1)[:, :arity]
    fmap = T.new_fmap(n_factors * arity)
    fmap["vid"] = r.ravel()
    fmap["dense_equal_to"] = 0

    domain_mask = np.zeros(n_vars, np.bool_)
    return weights, variables, factors, fmap, domain_mask, n_factors * arity
