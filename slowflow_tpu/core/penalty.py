"""Robust penalty functions rho(x^2) with `apply` and `derivative`.

Ports of penalty_functions/*.h — each operates on the *squared* residual:
  0 quadratic       rho(s) = s                 rho'(s) = 1
  1 modified L1     rho(s) = sqrt(s + eps^2)   rho'(s) = 1 / (2 sqrt(s + eps^2))
  2 Lorentzian      rho(s) = log(1 + s/(2 eps^2))   rho'(s) = 1/(2 eps^2 + s)
  3 truncated mod-L1: mod-L1 with rho(s)=sqrt(trunc+eps^2), rho'=0 for sqrt(s)>trunc
  4 Geman-McClure   rho(s) = s/(s+1)^2         rho'(s) = (eps^2 + 2s)/(eps^2+s)^2

Selection ids match `select_robust_function` (variational_aux_mt.cpp:903-926).
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

import jax.numpy as jnp


@dataclass(frozen=True)
class Penalty:
    name: str
    apply: Callable
    derivative: Callable


def make_penalty(fct: int, eps: float = 0.001, trunc: float = 0.5) -> Penalty:
    eps_sq = float(eps) * float(eps)
    trunc = float(trunc)

    if fct == 0:
        return Penalty("quadratic", lambda s: s, lambda s: jnp.ones_like(s))
    if fct == 2:
        return Penalty(
            "lorentzian",
            lambda s: jnp.log1p(0.5 * s / eps_sq),
            lambda s: 1.0 / (2.0 * eps_sq + s),
        )
    if fct == 3:
        def apply(s):
            return jnp.where(jnp.sqrt(s) > trunc,
                             jnp.sqrt(trunc + eps_sq), jnp.sqrt(s + eps_sq))

        def derivative(s):
            return jnp.where(jnp.sqrt(s) > trunc,
                             0.0, 1.0 / (2.0 * jnp.sqrt(s + eps_sq)))

        return Penalty("trunc_modified_l1", apply, derivative)
    if fct == 4:
        return Penalty(
            "geman_mcclure",
            lambda s: s / ((s + 1.0) * (s + 1.0)),
            lambda s: (eps_sq + 2.0 * s) / ((eps_sq + s) * (eps_sq + s)),
        )
    # default: modified L1 (Charbonnier)
    return Penalty(
        "modified_l1",
        lambda s: jnp.sqrt(s + eps_sq),
        lambda s: 1.0 / (2.0 * jnp.sqrt(s + eps_sq)),
    )


PENALTIES = {i: make_penalty(i) for i in range(5)}
