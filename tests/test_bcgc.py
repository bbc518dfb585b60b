"""add_bcgc (the stage-3 hot energy) vs a plain NumPy oracle of the
reference's addBCGC semantics (dense_tracking.cpp:240-349): per window
offset and frame, bilinear-sample image + gradients at the trajectory
position (clamp-at-border, utils.h:183-218), then average |I_i - I_j| +
|G_i - G_j| over all visible frame pairs and window pixels."""
import numpy as np
import pytest

jax = pytest.importorskip("jax")


def _bilinear(field, x, y):
    h, w = field.shape[:2]
    x0 = int(np.floor(x))
    y0 = int(np.floor(y))
    fx = min(max(x - x0, 0.0), 1.0) if x0 + 1 <= w - 1 else 0.0
    fy = min(max(y - y0, 0.0), 1.0) if y0 + 1 <= h - 1 else 0.0
    x0c, y0c = min(max(x0, 0), w - 1), min(max(y0, 0), h - 1)
    x1c, y1c = min(max(x0 + 1, 0), w - 1), min(max(y0 + 1, 0), h - 1)
    return (field[y0c, x0c] * (1 - fx) * (1 - fy)
            + field[y0c, x1c] * fx * (1 - fy)
            + field[y1c, x0c] * (1 - fx) * fy
            + field[y1c, x1c] * fx * fy)


def _oracle(px, py, flows, occl, data, ddx, ddy, bc, gc, skip_pixel,
            occ_masks=None):
    h, w = data.shape[1:3]
    Jp1 = data.shape[0]
    r = int(0.5 * (skip_pixel + 1))
    disp = np.concatenate([np.zeros((1, 2)), flows], 0)     # [J+1, 2]
    e_total, neighs = 0.0, 0
    for oy in range(-r, r + 1):
        for ox in range(-r, r + 1):
            bx, by = px + ox, py + oy
            if not (0 <= bx < w and 0 <= by < h):
                continue
            neighs += 1
            I = np.zeros((Jp1, 3))
            G = np.zeros((Jp1, 6))
            vis = np.zeros(Jp1, bool)
            for t in range(Jp1):
                x = bx + disp[t, 0]
                y = by + disp[t, 1]
                inside = (0 <= x < w) and (0 <= y < h)
                vis[t] = inside and occl[t] == 0
                if vis[t] and occ_masks is not None and t >= 1:
                    xi = int(min(max(x, 0), w - 1))
                    yi = int(min(max(y, 0), h - 1))
                    vis[t] = vis[t] and occ_masks[t - 1][yi, xi] != 0
                if inside:
                    I[t] = _bilinear(data[t], x, y)
                    G[t, :3] = _bilinear(ddx[t], x, y)
                    G[t, 3:] = _bilinear(ddy[t], x, y)
            e, pairs = 0.0, 0
            for i in range(Jp1):
                for j in range(i + 1, Jp1):
                    if vis[i] and vis[j]:
                        e += (bc * 0.3334 * np.abs(I[i] - I[j]).sum()
                              + gc * 0.3334 * np.abs(G[i] - G[j]).sum())
                        pairs += 1
            e_total += e / max(pairs, 1)
    return e_total / max(neighs, 1)


def test_add_bcgc_matches_oracle():
    import jax.numpy as jnp

    from slowflow_tpu.tracking.hypothesis import EnergyParams, add_bcgc

    rng = np.random.default_rng(4)
    h, w, J, G = 10, 12, 4, 2
    data = rng.random((J + 1, h, w, 3)).astype(np.float32)
    ddx = rng.random((J + 1, h, w, 3)).astype(np.float32)
    ddy = rng.random((J + 1, h, w, 3)).astype(np.float32)
    occ_masks = (rng.random((J, h, w)) > 0.2).astype(np.uint8)

    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    flows = (rng.standard_normal((h, w, G, J, 2)) * 2).astype(np.float32)
    # some trajectories run out of the image; some are unknown
    flows[0, 0, 0] = 50.0
    flows[2, 3, 1] = 1e10
    occl = (rng.random((h, w, G, J + 1)) < 0.25).astype(np.int32)

    p = EnergyParams(acc_bc=0.1, acc_gc=1.0, skip_pixel=1)
    for masks in (None, occ_masks):
        got = np.asarray(add_bcgc(
            jnp.asarray(xx)[..., None], jnp.asarray(yy)[..., None],
            jnp.asarray(flows), jnp.asarray(occl), jnp.asarray(data),
            jnp.asarray(ddx), jnp.asarray(ddy), p,
            None if masks is None else jnp.asarray(masks)))
        for (py_, px_, g) in [(0, 0, 0), (2, 3, 1), (5, 6, 0), (9, 11, 1),
                              (0, 11, 0), (4, 4, 1)]:
            want = _oracle(px_, py_, flows[py_, px_, g], occl[py_, px_, g],
                           data, ddx, ddy, 0.1, 1.0, 1, masks)
            assert abs(got[py_, px_, g] - want) < 5e-4, \
                (py_, px_, g, got[py_, px_, g], want, masks is None)

def test_add_bcgc_group_scan_matches_vectorized(monkeypatch):
    """The memory-bounded lax.map-over-groups path (taken when the patch
    working set exceeds BCGC_SCAN_BYTES) is numerically equivalent to the
    all-groups dispatch."""
    import jax.numpy as jnp

    from slowflow_tpu.tracking import hypothesis as hyp

    rng = np.random.default_rng(11)
    h, w, J, G = 9, 13, 3, 4
    data = rng.random((J + 1, h, w, 3)).astype(np.float32)
    ddx = rng.random((J + 1, h, w, 3)).astype(np.float32)
    ddy = rng.random((J + 1, h, w, 3)).astype(np.float32)
    occ_masks = (rng.random((J, h, w)) > 0.2).astype(np.uint8)
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    flows = (rng.standard_normal((h, w, G, J, 2)) * 2).astype(np.float32)
    occl = (rng.random((h, w, G, J + 1)) < 0.25).astype(np.int32)
    p = hyp.EnergyParams(acc_bc=0.1, acc_gc=1.0, skip_pixel=1)

    args = (jnp.asarray(xx)[..., None], jnp.asarray(yy)[..., None],
            jnp.asarray(flows), jnp.asarray(occl), jnp.asarray(data),
            jnp.asarray(ddx), jnp.asarray(ddy), p)
    for masks in (None, jnp.asarray(occ_masks)):
        want = np.asarray(hyp._add_bcgc_groups(*args, masks))
        monkeypatch.setattr(hyp, "BCGC_SCAN_BYTES", 0)
        got = np.asarray(hyp.add_bcgc(*args, masks))
        monkeypatch.undo()
        np.testing.assert_allclose(got, want, atol=1e-5)
