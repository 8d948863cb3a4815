"""Fused quotient-polynomial evaluation over the 8n coset (device).

Counterpart of /root/reference/src/proof_system/quotient_poly.rs re-designed
for XLA: the reference evaluates 17 gate identities per point in a rayon loop;
here the whole 8n-point identity system is ONE fused elementwise tensor program
(VPU-shaped), the omega-shifted reads are cyclic rolls by 8 (the coset-order
trick of quotient_poly.rs:58-64), and the division by the vanishing polynomial
is a multiply with a precomputed inverse table.

Challenge scalars arrive packed as one (L, NCHAL) Montgomery tensor (host
computes all challenge *products* — beta*K1, sep*kappa^i, ... — so the device
never multiplies two challenges together).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..field import FR, params

R = params.R_MOD

# challenge slot layout
CHAL_SLOTS = (
    "alpha", "alpha_sq", "beta", "beta_k1", "beta_k2", "beta_k3", "gamma",
    "r_s", "r_sk", "r_sk2", "r_sk3",
    "l_s", "l_sk", "l_sk2", "l_sk3", "l_sk4",
    "f_s", "f_sk", "f_sk2", "f_sk3",
    "v_s", "v_sk", "v_sk2",
)
NCHAL = len(CHAL_SLOTS)


def pack_challenges(alpha, beta, gamma, range_sep, logic_sep, fixed_sep, var_sep):
    """Host: build the (L, NCHAL) Montgomery challenge tensor."""
    def kappas(s, count):
        k = s * s % R
        out, acc = [s], s
        for _ in range(count - 1):
            acc = acc * k % R
            out.append(acc)
        return out

    vals = {
        "alpha": alpha,
        "alpha_sq": alpha * alpha % R,
        "beta": beta,
        "beta_k1": beta * params.K1 % R,
        "beta_k2": beta * params.K2 % R,
        "beta_k3": beta * params.K3 % R,
        "gamma": gamma,
    }
    for name, v in zip(("r_s", "r_sk", "r_sk2", "r_sk3"), kappas(range_sep, 4)):
        vals[name] = v
    for name, v in zip(("l_s", "l_sk", "l_sk2", "l_sk3", "l_sk4"), kappas(logic_sep, 5)):
        vals[name] = v
    for name, v in zip(("f_s", "f_sk", "f_sk2", "f_sk3"), kappas(fixed_sep, 4)):
        vals[name] = v
    for name, v in zip(("v_s", "v_sk", "v_sk2"), kappas(var_sep, 3)):
        vals[name] = v
    ordered = [vals[k] * FR.R % R for k in CHAL_SLOTS]  # Montgomery form
    return FR.pack(ordered)


def _mont_const(x: int, ndim: int):
    return jnp.asarray(FR.pack([x * FR.R % R]).reshape((FR.L,) + (1,) * (ndim - 1)))


def _delta(f):
    """f(f-1)(f-2)(f-3), f Montgomery (L, m)."""
    one = _mont_const(1, f.ndim)
    two = _mont_const(2, f.ndim)
    three = _mont_const(3, f.ndim)
    return FR.mul(
        FR.mul(f, FR.sub(f, one)), FR.mul(FR.sub(f, two), FR.sub(f, three))
    )


def _small(f, k: int):
    """multiply by small constant k via Montgomery const."""
    return FR.mul(f, _mont_const(k, f.ndim))


def quotient_evals(sel, sigma8, linear8, l1_8, vh_inv8, wires8, z8, pi8, chal):
    """All-points quotient numerator / z_H over the 8n coset.

    sel:    dict name -> (L, m) coset evals of the 11 selector polys
    sigma8: (L, 4, m) coset evals of sigma polys
    linear8:(L, m) coset evals of X
    l1_8:   (L, m) coset evals of L_1 (unscaled)
    vh_inv8:(L, m) inverse vanishing evals
    wires8: (L, 4, m) coset evals of a,b,c,d (blinded wire polys)
    z8:     (L, m) coset evals of z
    pi8:    (L, m) coset evals of the (negated-convention) PI polynomial
    chal:   (L, NCHAL) packed challenges
    Returns t evals (L, m).
    """
    M, A, S = FR.mul, FR.add, FR.sub
    c = {name: chal[:, i : i + 1] for i, name in enumerate(CHAL_SLOTS)}
    a, b, o, d = wires8[:, 0], wires8[:, 1], wires8[:, 2], wires8[:, 3]
    a_w = jnp.roll(a, -8, axis=-1)
    b_w = jnp.roll(b, -8, axis=-1)
    d_w = jnp.roll(d, -8, axis=-1)
    z_w = jnp.roll(z8, -8, axis=-1)
    one = _mont_const(1, a.ndim)

    # arithmetic: (q_m ab + q_l a + q_r b + q_o c + q_f d + q_c) q_arith
    t_arith = M(
        A(A(A(M(M(a, b), sel["q_m"]), M(a, sel["q_l"])),
            A(M(b, sel["q_r"]), M(o, sel["q_o"]))),
          A(M(d, sel["q_f"]), sel["q_c"])),
        sel["q_arith"],
    )

    # range: (d1 + d2*k + d3*k^2 + d4*k^3) q_range sep  [folded sep*kappa^i]
    f1 = S(o, _small(d, 4))
    f2 = S(b, _small(o, 4))
    f3 = S(a, _small(b, 4))
    f4 = S(d_w, _small(a, 4))
    t_range = M(
        A(A(M(_delta(f1), c["r_s"]), M(_delta(f2), c["r_sk"])),
          A(M(_delta(f3), c["r_sk2"]), M(_delta(f4), c["r_sk3"]))),
        sel["q_range"],
    )

    # logic
    la = S(a_w, _small(a, 4))
    lb = S(b_w, _small(b, 4))
    ld = S(d_w, _small(d, 4))
    lw = o
    c0 = M(_delta(la), c["l_s"])
    c1 = M(_delta(lb), c["l_sk"])
    c2 = M(_delta(ld), c["l_sk2"])
    c3 = M(S(lw, M(la, lb)), c["l_sk3"])
    # delta_xor_and(a,b,w,d,q_c)
    nine, two, three, four = 9, 2, 3, 4
    Fterm = M(lw, A(A(M(lw, A(S(_small(lw, four), _small(A(la, lb), 18)),
                                _mont_const(81, lw.ndim))),
                      _small(A(M(la, la), M(lb, lb)), 18)),
                    S(_mont_const(83, lw.ndim), _small(A(la, lb), 81))))
    Eterm = S(_small(A(A(la, lb), ld), three), _small(Fterm, two))
    Bterm = M(sel["q_c"], S(_small(ld, nine), _small(A(la, lb), three)))
    c4 = M(A(Bterm, Eterm), c["l_sk4"])
    t_logic = M(A(A(A(c0, c1), A(c2, c3)), c4), sel["q_logic"])

    # fixed-base ECC
    x_beta, y_beta = sel["q_l"], sel["q_r"]
    bit = S(d_w, FR.double(d))
    bit_cons = M(M(bit, S(bit, one)), A(bit, one))
    y_alpha = A(M(M(bit, bit), S(y_beta, one)), one)
    x_alpha = M(bit, x_beta)
    xy_cons = M(S(M(bit, sel["q_c"]), o), c["f_sk"])
    ed = _mont_const(params.JUBJUB_D, a.ndim)
    dxy = M(M(M(o, a), b), ed)  # xy_alpha * acc_x * acc_y * D
    x_acc = M(S(A(a_w, M(a_w, dxy)), A(M(a, y_alpha), M(b, x_alpha))), c["f_sk2"])
    y_acc = M(S(S(b_w, M(b_w, dxy)), A(M(b, y_alpha), M(a, x_alpha))), c["f_sk3"])
    t_fixed = M(A(A(M(bit_cons, c["f_s"]), xy_cons), A(x_acc, y_acc)),
                sel["q_fixed_group_add"])

    # variable-base ECC add
    x1, y1, x2, y2, x1y2 = a, b, o, d, d_w
    x3, y3 = a_w, b_w
    xy_cons_v = M(S(M(x1, y2), x1y2), c["v_s"])
    y1x2 = M(y1, x2)
    dterm = M(M(ed, x1y2), y1x2)
    x3_c = M(S(A(x1y2, y1x2), A(x3, M(x3, dterm))), c["v_sk"])
    y3_c = M(S(A(M(y1, y2), M(x1, x2)), S(y3, M(y3, dterm))), c["v_sk2"])
    t_var = M(A(xy_cons_v, A(x3_c, y3_c)), sel["q_variable_group_add"])

    # permutation argument
    bx = M(linear8, c["beta"])
    idp = M(M(M(A(A(a, bx), c["gamma"]),
                A(A(b, M(linear8, c["beta_k1"])), c["gamma"])),
              M(A(A(o, M(linear8, c["beta_k2"])), c["gamma"]),
                A(A(d, M(linear8, c["beta_k3"])), c["gamma"]))),
            M(z8, c["alpha"]))
    cpy = M(M(M(A(A(a, M(sigma8[:, 0], c["beta"])), c["gamma"]),
                A(A(b, M(sigma8[:, 1], c["beta"])), c["gamma"])),
              M(A(A(o, M(sigma8[:, 2], c["beta"])), c["gamma"]),
                A(A(d, M(sigma8[:, 3], c["beta"])), c["gamma"]))),
            M(z_w, c["alpha"]))
    l1term = M(S(z8, one), M(l1_8, c["alpha_sq"]))
    t_perm = A(S(idp, cpy), l1term)

    total = A(A(A(t_arith, t_range), A(t_logic, t_fixed)),
              A(A(t_var, pi8), t_perm))
    return M(total, vh_inv8)
