"""Numpy oracle for one PBF density-projection step, written in the
edge-list formulation of the reference (gm_dynamics.py:1076-1184) with exact
brute-force neighbor search. Used to golden-test the dense padded-list JAX
solver."""
import numpy as np


class P:
    h = 0.625
    p0 = 1.5
    k = 3.0
    eps = 1e-8
    relaxation = 0.01
    k_p = 0.2
    e_p = 4.0
    dq_p = 0.25

    @classmethod
    def poly6_term1(cls):
        return 315.0 / (64.0 * np.pi * cls.h**9)

    @classmethod
    def spiky_term1(cls):
        return 45.0 / (np.pi * cls.h**6)

    @classmethod
    def lamb_corr_denom(cls):
        r2 = (cls.dq_p * cls.dq_p * cls.h * cls.h)
        return cls.poly6_term1() * (cls.h**2 - r2) ** 3


def poly6(r2, h):
    return np.where(r2 < h * h, P.poly6_term1() * (h * h - r2) ** 3, 0.0)


def project_step_ref(exyz, velocity, force, imass, counts, h=0.625):
    """Returns (new_estimate, new_force). Edges: all pairs within h incl self."""
    P.h = h
    n = len(exyz)
    d = np.linalg.norm(exyz[:, None] - exyz[None, :], axis=-1)
    adj = d <= h  # incl self

    pi = np.zeros(n)
    gr = np.zeros((n, 3))
    grad_dot = np.zeros(n)
    deltas_sum = np.zeros((n, 3))
    neighbors_len = adj.sum(1).astype(float)

    # lambdas need pi and denom first
    for i in range(n):
        for j in np.where(adj[i])[0]:
            diff = exyz[i] - exyz[j]
            r2 = diff @ diff
            pi[i] += poly6(r2, h)
    pi = pi / imass
    for i in range(n):
        for j in np.where(adj[i])[0]:
            if j == i:
                continue
            diff = exyz[i] - exyz[j]
            rlen = np.sqrt(diff @ diff + P.eps)
            if rlen < h and rlen > 0:
                g = -(diff / (rlen + P.eps)) * P.spiky_term1() * (h - rlen) ** 2
            else:
                g = np.zeros(3)
            gr[i] += g / P.p0
            grad_dot[i] += np.sum((g / P.p0) ** 2)
    gr_dot = np.sum(gr**2, -1)
    denom = grad_dot + gr_dot

    p_ratio = pi / P.p0
    force_new = force + velocity * (1.0 - p_ratio)[:, None] * -P.k
    lambdas = -(p_ratio - 1.0) / (denom + P.relaxation)

    for i in range(n):
        for j in np.where(adj[i])[0]:
            if j == i:
                continue
            diff = exyz[i] - exyz[j]
            r2 = diff @ diff
            rlen = np.sqrt(r2 + P.eps)
            if rlen < h and rlen > 0:
                g = -(diff / (rlen + P.eps)) * P.spiky_term1() * (h - rlen) ** 2
            else:
                g = np.zeros(3)
            lamb_corr = -P.k_p * (poly6(r2, h) / P.lamb_corr_denom()) ** P.e_p
            deltas_sum[i] += (lambdas[i] + lambdas[j] + lamb_corr) * g
    deltas_sum /= P.p0
    delta = deltas_sum / (neighbors_len + counts)[:, None]
    return exyz + delta, force_new, dict(pi=pi, lambdas=lambdas, p_ratio=p_ratio)
