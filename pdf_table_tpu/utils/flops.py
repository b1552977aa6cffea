"""Analytic FLOP counting by walking jaxprs.

The axon (tunneled-TPU) jax client returns None from
``Lowered.cost_analysis()`` and re-compiling just to read
``Compiled.cost_analysis()`` costs minutes per program on the
remote-compile rig — so MFU accounting derives FLOPs from the traced
jaxpr instead: 2·M·N·K per ``dot_general``, the standard
2·N·out_spatial·Cout·(Cin/groups)·prod(kernel) per
``conv_general_dilated``, inner-jaxpr recursion for pjit/scan/while/cond
(scan bodies multiply by trip count), and Pallas kernels count their
kernel jaxpr times the grid size. Elementwise/reduction ops are ignored —
on the MXU-dominated programs measured here they are noise (<1%), and the
resulting MFU is therefore a slight UNDERestimate (conservative).
"""

from __future__ import annotations

import math
from functools import reduce
from typing import Any

import jax
from jax.extend import core as jcore


def _prod(xs) -> float:
    return float(reduce(lambda a, b: a * b, xs, 1))


def _dot_flops(eqn) -> float:
    a, b = eqn.invars[0].aval, eqn.invars[1].aval
    dn = eqn.params["dimension_numbers"]
    (lhs_c, _rhs_c), (lhs_b, _rhs_b) = dn
    batch = _prod(a.shape[i] for i in lhs_b)
    k = _prod(a.shape[i] for i in lhs_c)
    m = _prod(a.shape[i] for i in range(len(a.shape))
              if i not in lhs_c and i not in lhs_b)
    n = _prod(b.shape[i] for i in range(len(b.shape))
              if i not in dn[0][1] and i not in dn[1][1])
    return 2.0 * batch * m * n * k


def _conv_flops(eqn) -> float:
    lhs, rhs = eqn.invars[0].aval, eqn.invars[1].aval
    out = eqn.outvars[0].aval
    dn = eqn.params["dimension_numbers"]
    fg = eqn.params.get("feature_group_count", 1)
    bg = eqn.params.get("batch_group_count", 1)
    # out spatial x batch x Cout
    out_elems = _prod(out.shape)
    cin = lhs.shape[dn.lhs_spec[1]]
    kernel_spatial = _prod(rhs.shape[i] for i in dn.rhs_spec[2:])
    return 2.0 * out_elems * (cin / fg) * kernel_spatial / bg


def _subjaxprs(eqn):
    """(jaxpr, multiplier) pairs nested in an eqn's params."""
    p = eqn.params
    prim = eqn.primitive.name
    if prim == "scan":
        yield p["jaxpr"], float(p["length"])
        return
    if prim == "while":
        # trip count unknowable statically: count one iteration of body
        # + cond (documented approximation)
        yield p["body_jaxpr"], 1.0
        yield p["cond_jaxpr"], 1.0
        return
    if prim == "cond":
        # branches are alternatives; take the max as the bound
        branches = p.get("branches", ())
        if branches:
            best = max(jaxpr_flops(b) for b in branches)
            yield _Const(best), 1.0
        return
    if prim == "pallas_call":
        grid = ()
        gm = p.get("grid_mapping")
        if gm is not None:
            grid = tuple(getattr(gm, "grid", ()) or ())
        mult = _prod(g for g in grid if isinstance(g, int)) if grid else 1.0
        yield p["jaxpr"], mult
        return
    for v in p.values():
        if isinstance(v, (jcore.Jaxpr, jcore.ClosedJaxpr)):
            yield v, 1.0
        elif isinstance(v, (tuple, list)):
            for x in v:
                if isinstance(x, (jcore.Jaxpr, jcore.ClosedJaxpr)):
                    yield x, 1.0


class _Const:
    """Pre-computed flops stand-in for branch maxima."""

    def __init__(self, flops: float):
        self.flops = flops


def jaxpr_flops(jaxpr: Any) -> float:
    if isinstance(jaxpr, _Const):
        return jaxpr.flops
    if isinstance(jaxpr, jcore.ClosedJaxpr):
        jaxpr = jaxpr.jaxpr
    total = 0.0
    for eqn in jaxpr.eqns:
        name = eqn.primitive.name
        if name == "dot_general":
            total += _dot_flops(eqn)
        elif name == "conv_general_dilated":
            total += _conv_flops(eqn)
        else:
            for sub, mult in _subjaxprs(eqn):
                total += mult * jaxpr_flops(sub)
    return total


def fn_flops(fn, *arg_specs) -> float:
    """Analytic FLOPs of ``fn(*arg_specs)`` (ShapeDtypeStructs or arrays).

    Traces abstractly — no device execution, no compile."""
    closed = jax.make_jaxpr(fn)(*arg_specs)
    return jaxpr_flops(closed)
