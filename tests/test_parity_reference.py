"""TRUE golden parity versus the C++ reference (SURVEY.md §4b).

The fixture inputs (synthetic affine-warp pair, SED-format edges,
DeepMatching-format matches) and the reference `epicflow` binary's outputs
were produced by tests/parity/make_parity_fixture.py, which builds
epic_flow_extended/ (epicflow.cpp:39-140) out-of-tree and runs it. These
tests feed the SAME inputs to our CLI and assert <0.1 px mean EPE against
the real reference output — parity with the thing itself, not with our own
numerics (BASELINE.md north star: <0.1 px mean-EPE deviation).
"""
from pathlib import Path

import numpy as np
import pytest

from slowflow_tpu.io import read_flo

PARITY = Path(__file__).resolve().parent / "parity"


def run_ours(tmp_path, extra):
    from slowflow_tpu.cli.epicflow import main

    out = tmp_path / "ours.flo"
    rc = main([str(PARITY / "im1.png"), str(PARITY / "im2.png"),
               str(PARITY / "edges.dat"), str(PARITY / "matches.txt"),
               str(out)] + extra)
    assert rc == 0
    return read_flo(out)


def mean_epe(a, b):
    return float(np.hypot(a[..., 0] - b[..., 0], a[..., 1] - b[..., 1]).mean())


@pytest.mark.parametrize("golden,extra", [
    ("ref_la_sintel.flo", ["-sintel"]),
    ("ref_nw_sintel.flo", ["-nw", "-sintel"]),
])
def test_parity_vs_reference_binary(tmp_path, golden, extra):
    ref = read_flo(PARITY / golden)
    ours = run_ours(tmp_path, extra)
    err = mean_epe(ours, ref)
    assert err < 0.1, f"mean EPE vs reference binary = {err:.4f} px"


def test_reference_goldens_match_gt():
    """Sanity: the checked-in reference outputs themselves recover the
    analytic ground-truth flow (guards fixture regeneration mistakes)."""
    gt = np.load(PARITY / "gt_flow.npy")
    for name in ("ref_la_sintel.flo", "ref_nw_sintel.flo"):
        err = mean_epe(read_flo(PARITY / name), gt)
        assert err < 0.15, (name, err)
