"""Sequential TRW-S oracle (test-only, own idiom).

Reference semantics: TRW-S v1.3 (`MRFEnergy<TypeGeneral>::Minimize_TRW_S`)
as used at dense_tracking.cpp:1816-1831 — sequential tree-reweighted message
passing over the 4-connected grid in scanline order with a monotone lower
bound. This oracle is written from the published algorithm (Kolmogorov,
"Convergent Tree-Reweighted Message Passing for Energy Minimization",
PAMI 2006): forward/backward passes with per-node weights
gamma_p = 1 / max(#earlier, #later neighbours), and the lower bound
evaluated directly as the reparametrization dual

    Phi(m) = sum_p min_l th_p(l)  +  sum_pq min_{l,l'} th_pq(l, l')

where th_p = theta_p + sum incoming messages and th_pq = theta_pq minus the
two messages. Phi is a valid lower bound on the optimum for ANY messages
(reparametrizations preserve the energy), and TRW-S's passes make it
monotone non-decreasing — asserted by the tests rather than assumed.

Nothing in the production package imports this module.
"""
from __future__ import annotations

import numpy as np


class SequentialTRWS:
    """4-connected grid, scanline order. unary [H, W, K]; cost_r / cost_d
    [H, W, K, K] edge tables to the right/down neighbour (entries at the
    last column/row are ignored)."""

    def __init__(self, unary, cost_r, cost_d):
        self.unary = np.asarray(unary, np.float64)
        self.cost_r = np.asarray(cost_r, np.float64)
        self.cost_d = np.asarray(cost_d, np.float64)
        self.h, self.w, self.k = self.unary.shape
        z = np.zeros((self.h, self.w, self.k))
        # messages INTO each node from its four neighbours
        self.m_l = z.copy()     # from the left neighbour
        self.m_r = z.copy()
        self.m_u = z.copy()
        self.m_d = z.copy()

        # gamma_p = 1 / max(#earlier, #later neighbours) in scanline order:
        # earlier = {left, up}, later = {right, down}
        n_earlier = np.zeros((self.h, self.w))
        n_later = np.zeros((self.h, self.w))
        n_earlier += (np.arange(self.w) > 0)[None, :]
        n_earlier += (np.arange(self.h) > 0)[:, None]
        n_later += (np.arange(self.w) < self.w - 1)[None, :]
        n_later += (np.arange(self.h) < self.h - 1)[:, None]
        self.gamma = 1.0 / np.maximum(np.maximum(n_earlier, n_later), 1.0)

    # -- message updates ----------------------------------------------------
    def _theta_hat(self, y, x):
        return (self.unary[y, x] + self.m_l[y, x] + self.m_r[y, x]
                + self.m_u[y, x] + self.m_d[y, x])

    def _pass(self, forward: bool):
        ys = range(self.h) if forward else range(self.h - 1, -1, -1)
        for y in ys:
            xs = range(self.w) if forward else range(self.w - 1, -1, -1)
            for x in xs:
                th = self.gamma[y, x] * self._theta_hat(y, x)
                if forward:
                    if x + 1 < self.w:      # send right
                        t = (th - self.m_r[y, x])[:, None] + self.cost_r[y, x]
                        m = t.min(0)
                        self.m_l[y, x + 1] = m - m.min()
                    if y + 1 < self.h:      # send down
                        t = (th - self.m_d[y, x])[:, None] + self.cost_d[y, x]
                        m = t.min(0)
                        self.m_u[y + 1, x] = m - m.min()
                else:
                    if x > 0:               # send left
                        t = (th - self.m_l[y, x])[:, None] \
                            + self.cost_r[y, x - 1].T
                        m = t.min(0)
                        self.m_r[y, x - 1] = m - m.min()
                    if y > 0:               # send up
                        t = (th - self.m_u[y, x])[:, None] \
                            + self.cost_d[y - 1, x].T
                        m = t.min(0)
                        self.m_d[y - 1, x] = m - m.min()

    # -- bound / labeling / energy -------------------------------------------
    def lower_bound(self) -> float:
        """Chain-decomposition dual: every node's reparametrized unary is
        split equally between its row chain and its column chain (the grid's
        monotonic-chain cover: each edge in exactly one chain, each node in
        exactly two), and every chain is solved EXACTLY by min-sum DP. The
        sum of chain minima is a valid lower bound for any messages, because
        reparametrization preserves the energy and each labeling is feasible
        for every chain."""
        th = 0.5 * (self.unary + self.m_l + self.m_r + self.m_u + self.m_d)
        # reparametrized edge tables
        er = (self.cost_r[:, :-1]
              - self.m_l[:, 1:, None, :]
              - self.m_r[:, :-1, :, None])       # [H, W-1, K, K]
        ed = (self.cost_d[:-1]
              - self.m_u[1:, :, None, :]
              - self.m_d[:-1, :, :, None])       # [H-1, W, K, K]

        # row chains: DP left -> right, vectorized over rows
        acc = th[:, 0].copy()                    # [H, K]
        for x in range(1, self.w):
            acc = (acc[:, :, None] + er[:, x - 1]).min(1) + th[:, x]
        phi = acc.min(-1).sum()
        # column chains: DP top -> bottom, vectorized over columns
        acc = th[0].copy()                       # [W, K]
        for y in range(1, self.h):
            acc = (acc[:, :, None] + ed[y - 1]).min(1) + th[y]
        phi += acc.min(-1).sum()
        return float(phi)

    def labeling(self) -> np.ndarray:
        """Greedy conditioned decode in scanline order (the v1.3
        GetSolution pattern: argmin of the reparametrized unary plus edge
        terms to already-decoded earlier neighbours)."""
        lab = np.zeros((self.h, self.w), np.int32)
        for y in range(self.h):
            for x in range(self.w):
                score = self._theta_hat(y, x).copy()
                if x > 0:
                    score += (self.cost_r[y, x - 1][lab[y, x - 1]]
                              - self.m_l[y, x])
                if y > 0:
                    score += (self.cost_d[y - 1, x][lab[y - 1, x]]
                              - self.m_u[y, x])
                lab[y, x] = int(score.argmin())
        return lab

    def energy(self, lab) -> float:
        e = self.unary[np.arange(self.h)[:, None],
                       np.arange(self.w)[None, :], lab].sum()
        e += self.cost_r[np.arange(self.h)[:, None],
                         np.arange(self.w - 1)[None, :],
                         lab[:, :-1], lab[:, 1:]].sum()
        e += self.cost_d[np.arange(self.h - 1)[:, None],
                         np.arange(self.w)[None, :],
                         lab[:-1, :], lab[1:, :]].sum()
        return float(e)

    def run(self, iters: int = 30):
        """Full TRW-S iterations (forward+backward each). Returns
        (labeling, energies, bounds) with one bound per iteration."""
        bounds = []
        for _ in range(iters):
            self._pass(forward=True)
            self._pass(forward=False)
            bounds.append(self.lower_bound())
        lab = self.labeling()
        return lab, self.energy(lab), np.asarray(bounds)
