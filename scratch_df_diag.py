"""DeepFlow in-sector EPE diagnosis (round 5, VERDICT next #1).

Questions, measured on echo content at the production matching path:
 1. How converged is the PRODUCTION ORACLE vs its own converged self?
    floor = EPE(oracle@prod_iters, oracle@deep_iters) in-sector.
 2. How converged is the SOLVER vs the converged oracle?
    gap_conv = EPE(solver@prod, oracle@deep) in-sector.
 3. Does cranking solver Jacobi iters close the gap?
    gap_more = EPE(solver@iters=100, oracle@deep).

If gap_conv ~= floor -> protocol noise, floor argument.
If gap_conv >> floor but gap_more small -> solver under-convergence,
implement SOR / more iterations.
"""
import json
import sys
import time

import numpy as np

from tee_optical_flow_tpu.synthetic import echo_sector_masks, make_echo_pair
from epe_report import _backend_matches, DF_SETTINGS

H, W = map(int, sys.argv[1:3]) if len(sys.argv) > 2 else (240, 320)

from tee_optical_flow_tpu.ops.deepflow_oracle import deepflow_flow_oracle, epe
from tee_optical_flow_tpu.ops.deepflow import deepflow_pairs
import jax.numpy as jnp

masks = {k: v for k, v in echo_sector_masks(H, W).items()
         if k in ("sector", "wall")}
INTERIOR = 8


def stats(err, mask=None):
    sel = np.zeros_like(err, bool)
    sel[INTERIOR:-INTERIOR, INTERIOR:-INTERIOR] = True
    if mask is not None:
        sel &= mask
    e = err[sel]
    return dict(median=round(float(np.median(e)), 5),
                p95=round(float(np.percentile(e, 95)), 5),
                p99=round(float(np.percentile(e, 99)), 5))


out = {}
for k in (0, 1):
    i0, i1 = make_echo_pair(100 + k, H, W, contraction=0.03 + 0.02 * k)
    mdict, init = _backend_matches(i0, i1)
    okw = dict(matches=mdict, init=init, beta=0.3, **DF_SETTINGS)

    t0 = time.time()
    golden_prod = deepflow_flow_oracle(i0, i1, fp_iters=3, psi_iters=5,
                                       sor_iters=30, **okw)
    t_prod = time.time() - t0
    t0 = time.time()
    golden_deep = deepflow_flow_oracle(i0, i1, fp_iters=3, psi_iters=10,
                                       sor_iters=120, **okw)
    t_deep = time.time() - t0

    kw = dict(fp_iters=3, matching=True, use_pallas=False,
              interpolation="bicubic", **DF_SETTINGS)
    solver_prod = np.asarray(deepflow_pairs(
        jnp.asarray(i0[None]), jnp.asarray(i1[None]), iters=25, **kw))[0]
    solver_more = np.asarray(deepflow_pairs(
        jnp.asarray(i0[None]), jnp.asarray(i1[None]), iters=150, **kw))[0]

    case = {
        "oracle_seconds": [round(t_prod, 1), round(t_deep, 1)],
        "floor_oracleprod_vs_oracledeep": {
            n: stats(epe(golden_prod, golden_deep), m)
            for n, m in [("sector", masks["sector"]),
                         ("wall", masks["wall"])]},
        "solver25_vs_oracleprod": {
            n: stats(epe(solver_prod, golden_prod), m)
            for n, m in [("sector", masks["sector"]),
                         ("wall", masks["wall"])]},
        "solver25_vs_oracledeep": {
            n: stats(epe(solver_prod, golden_deep), m)
            for n, m in [("sector", masks["sector"]),
                         ("wall", masks["wall"])]},
        "solver150_vs_oracleprod": {
            n: stats(epe(solver_more, golden_prod), m)
            for n, m in [("sector", masks["sector"]),
                         ("wall", masks["wall"])]},
        "solver150_vs_oracledeep": {
            n: stats(epe(solver_more, golden_deep), m)
            for n, m in [("sector", masks["sector"]),
                         ("wall", masks["wall"])]},
    }
    out[f"echo_{k}"] = case
    print(json.dumps({f"echo_{k}": case}, indent=1), flush=True)

with open("/tmp/df_diag.json", "w") as f:
    json.dump(out, f, indent=1)
print("DONE")
