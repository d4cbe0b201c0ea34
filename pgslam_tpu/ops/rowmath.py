"""Row-layout math for Pallas TPU kernels.

Shared by the fused pose-graph LM kernel (``optim/lm_pallas.py``) and the
fused ICP kernel (``ops/icp_pallas.py``). Convention: a batch of scalars
is a ``[1, N]`` array ("row"); a batch of 4x4 transforms is a python list
of 16 rows (row 4*i+j = T[i, j]); a 6x6 block field is a nested 6x6 list
of rows. Entries may be python floats (constants) — the _mul/_add helpers
constant-fold zeros and ones so sparse structures cost nothing.

SE(3) log/exp mirror :mod:`pgslam_tpu.se3` numerics (same Taylor guards);
the SO(3) log uses a first-quadrant Cephes polynomial atan2 because
Mosaic has no atan2/acos lowering.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

def _isz(x):
    return isinstance(x, (int, float)) and x == 0


def _mul(a, b):
    if _isz(a) or _isz(b):
        return 0.0
    if isinstance(a, (int, float)) and a == 1:
        return b
    if isinstance(b, (int, float)) and b == 1:
        return a
    return a * b


def _add(a, b):
    if _isz(a):
        return b
    if _isz(b):
        return a
    return a + b


def _neg(a):
    return 0.0 if _isz(a) else -a


def _dotn(pairs):
    acc = 0.0
    for a, b in pairs:
        acc = _add(acc, _mul(a, b))
    return acc


def _to_row(x, like):
    return jnp.full_like(like, float(x)) if isinstance(x, (int, float)) \
        else x


def _mat4_mul(A, B):
    return [_dotn([(A[4 * i + k], B[4 * k + j]) for k in range(4)])
            for i in range(4) for j in range(4)]


def _se3_inv(T):
    out = [0.0] * 16
    for i in range(3):
        for j in range(3):
            out[4 * i + j] = T[4 * j + i]
    for i in range(3):
        out[4 * i + 3] = _neg(_dotn([(T[4 * k + i], T[4 * k + 3])
                                     for k in range(3)]))
    out[15] = 1.0
    return out


def _mm3(A, B):
    return [[_dotn([(A[i][k], B[k][j]) for k in range(3)])
             for j in range(3)] for i in range(3)]


def _t3(A):
    return [[A[j][i] for j in range(3)] for i in range(3)]


def _inv3(A):
    """Adjugate inverse of a 3x3 row-matrix (assumes invertible)."""
    c = [[0.0] * 3 for _ in range(3)]   # cofactors
    idx = [(1, 2), (0, 2), (0, 1)]
    sgn = [[1, -1, 1], [-1, 1, -1], [1, -1, 1]]
    for i in range(3):
        r = idx[i]
        for j in range(3):
            cidx = idx[j]
            m = _add(_mul(A[r[0]][cidx[0]], A[r[1]][cidx[1]]),
                     _neg(_mul(A[r[0]][cidx[1]], A[r[1]][cidx[0]])))
            c[i][j] = m if sgn[i][j] > 0 else _neg(m)
    det = _dotn([(A[0][k], c[0][k]) for k in range(3)])
    rdet = 1.0 / det
    return [[_mul(c[j][i], rdet) for j in range(3)] for i in range(3)]


def _schur_inv6(M):
    """Closed-form inverse of an SPD 6x6 row-matrix via 3x3 Schur blocks:
    inv([[A,B],[B^T,C]]) with S = C - B^T A^-1 B."""
    A = [[M[i][j] for j in range(3)] for i in range(3)]
    B = [[M[i][j + 3] for j in range(3)] for i in range(3)]
    C = [[M[i + 3][j + 3] for j in range(3)] for i in range(3)]
    Ai = _inv3(A)
    AiB = _mm3(Ai, B)
    S = [[_add(C[i][j], _neg(_dotn([(B[k][i], AiB[k][j])
                                    for k in range(3)])))
          for j in range(3)] for i in range(3)]
    Si = _inv3(S)
    AiBSi = _mm3(AiB, Si)
    TL = [[_add(Ai[i][j], _dotn([(AiBSi[i][k], AiB[j][k])
                                 for k in range(3)]))
           for j in range(3)] for i in range(3)]
    out = [[0.0] * 6 for _ in range(6)]
    for i in range(3):
        for j in range(3):
            out[i][j] = TL[i][j]
            out[i][j + 3] = _neg(AiBSi[i][j])
            out[i + 3][j] = _neg(AiBSi[j][i])
            out[i + 3][j + 3] = Si[i][j]
    return out


def _mm6(A, B):
    return [[_dotn([(A[i][k], B[k][j]) for k in range(6)])
             for j in range(6)] for i in range(6)]


def _t6(A):
    return [[A[j][i] for j in range(6)] for i in range(6)]


def _mv6(A, x):
    return [_dotn([(A[i][k], x[k]) for k in range(6)]) for i in range(6)]


def _eye6_plus(A, scale_a, B, scale_b):
    """I + scale_a * A + scale_b * B, entrywise."""
    out = [[_add(_mul(scale_a, A[i][j]), _mul(scale_b, B[i][j]))
            for j in range(6)] for i in range(6)]
    for i in range(6):
        out[i][i] = _add(1.0, out[i][i])
    return out


def _atan_poly(x):
    """Cephes atanf core for x in [0, 0.4142]; ~1 ulp f32."""
    z = x * x
    return (((8.05374449538e-2 * z - 1.38776856032e-1) * z
             + 1.99777106478e-1) * z - 3.33329491539e-1) * z * x + x


_PI_2 = 1.5707963267948966
_PI_4 = 0.7853981633974483
_TAN_PI_8 = 0.4142135623730950


def _atan01(r):
    """atan(r) for r in [0, 1] with the Cephes pi/4 range reduction."""
    hi = r > _TAN_PI_8
    rr = jnp.where(hi, (r - 1.0) / (r + 1.0), r)
    return jnp.where(hi, _PI_4 + _atan_poly(rr), _atan_poly(rr))


def _atan2_pos(y, x):
    """atan2(y, x) for y >= 0, x >= 0 (first quadrant), branch-free."""
    big = y > x
    num = jnp.where(big, x, y)
    den = jnp.where(big, y, x)
    r = num / jnp.maximum(den, 1e-30)
    phi = _atan01(r)
    return jnp.where(big, _PI_2 - phi, phi)


def _quat(T):
    """Shepperd quaternion of the rotation block, canonical (w >= 0).
    Mirrors ``se3.quaternion_from_matrix`` including tie order."""
    m00, m11, m22 = T[0], T[5], T[10]
    r01, r02, r10 = T[1], T[2], T[4]
    r12, r20, r21 = T[6], T[8], T[9]
    tr = m00 + m11 + m22

    def S(p):
        return 2.0 * jnp.sqrt(jnp.maximum(p, 1e-12))

    s_w = S(1.0 + tr)
    q_w = [0.25 * s_w, (r21 - r12) / s_w, (r02 - r20) / s_w,
           (r10 - r01) / s_w]
    s_x = S(1.0 + m00 - m11 - m22)
    q_x = [(r21 - r12) / s_x, 0.25 * s_x, (r01 + r10) / s_x,
           (r02 + r20) / s_x]
    s_y = S(1.0 - m00 + m11 - m22)
    q_y = [(r02 - r20) / s_y, (r01 + r10) / s_y, 0.25 * s_y,
           (r12 + r21) / s_y]
    s_z = S(1.0 - m00 - m11 + m22)
    q_z = [(r10 - r01) / s_z, (r02 + r20) / s_z, (r12 + r21) / s_z,
           0.25 * s_z]
    use_w = tr >= m00
    p01 = jnp.maximum(tr, m00)
    use_y = m11 >= m22
    p23 = jnp.maximum(m11, m22)
    first = p01 >= p23
    q = [jnp.where(first, jnp.where(use_w, a, b), jnp.where(use_y, c, d))
         for a, b, c, d in zip(q_w, q_x, q_y, q_z)]
    sign = jnp.where(q[0] < 0, -1.0, 1.0)
    q = [sign * qi for qi in q]
    rn = jax.lax.rsqrt(q[0] * q[0] + q[1] * q[1] + q[2] * q[2]
                       + q[3] * q[3])
    return [qi * rn for qi in q]


def _sinc_ABC(t2):
    """(A, B, C) of the Rodrigues formulas from theta^2, with the same
    Taylor guard as ``se3._sinc_coeffs``."""
    small = t2 < 1e-3
    safe_t2 = jnp.where(small, 1.0, t2)
    ts = jnp.sqrt(safe_t2)
    t4 = t2 * t2
    A = jnp.where(small, 1.0 - t2 / 6.0 + t4 / 120.0, jnp.sin(ts) / ts)
    B = jnp.where(small, 0.5 - t2 / 24.0 + t4 / 720.0,
                  (1.0 - jnp.cos(ts)) / safe_t2)
    C = jnp.where(small, 1.0 / 6.0 - t2 / 120.0 + t4 / 5040.0,
                  (1.0 - A) / safe_t2)
    return A, B, C


def _se3_log(T):
    """Twist rows [v; w] of a [16]-row transform. Mirrors ``se3.log``."""
    q = _quat(T)
    qw = q[0]
    n = jnp.sqrt(q[1] * q[1] + q[2] * q[2] + q[3] * q[3])
    angle = 2.0 * _atan2_pos(n, qw)
    small_n = n < 1e-8
    factor = jnp.where(small_n, 2.0 / jnp.maximum(qw, 1e-12),
                       angle / jnp.where(small_n, 1.0, n))
    w = [factor * q[1], factor * q[2], factor * q[3]]
    t2 = w[0] * w[0] + w[1] * w[1] + w[2] * w[2]
    A, B, _ = _sinc_ABC(t2)
    small = t2 < 1e-3
    safe_t2 = jnp.where(small, 1.0, t2)
    safe_B = jnp.where(small, 1.0, B)
    t4 = t2 * t2
    coef = jnp.where(small, 1.0 / 12.0 + t2 / 720.0 + t4 / 30240.0,
                     (1.0 - A / (2.0 * safe_B)) / safe_t2)
    # Vinv = I - W/2 + coef * (w w^T - t2 I)
    W = _hat_rows(w)
    t = [T[3], T[7], T[11]]
    v = []
    for i in range(3):
        acc = 0.0
        for j in range(3):
            ww = w[i] * w[j] - (t2 if i == j else 0.0)
            entry = _add((1.0 if i == j else 0.0),
                         _add(_mul(-0.5, W[i][j]), coef * ww))
            acc = _add(acc, _mul(entry, t[j]))
        v.append(acc)
    return v + w


def _hat_rows(w):
    return [[0.0, _neg(w[2]), w[1]],
            [w[2], 0.0, _neg(w[0])],
            [_neg(w[1]), w[0], 0.0]]


def _se3_exp(x6):
    """[16]-row transform of twist rows. Mirrors ``se3.exp``."""
    v, w = x6[:3], x6[3:]
    t2 = w[0] * w[0] + w[1] * w[1] + w[2] * w[2]
    A, B, C = _sinc_ABC(t2)
    W = _hat_rows(w)
    T = [0.0] * 16
    for i in range(3):
        for j in range(3):
            ww = w[i] * w[j] - (t2 if i == j else 0.0)
            T[4 * i + j] = _add((1.0 if i == j else 0.0),
                                _add(_mul(A, W[i][j]), B * ww))
    for i in range(3):
        acc = 0.0
        for j in range(3):
            ww = w[i] * w[j] - (t2 if i == j else 0.0)
            Ve = _add((1.0 if i == j else 0.0),
                      _add(_mul(B, W[i][j]), C * ww))
            acc = _add(acc, _mul(Ve, v[j]))
        T[4 * i + 3] = acc
    T[15] = 1.0
    return T


def _ad6(e):
    """little ad of a twist in [t; r] order: [[hat(w), hat(v)], [0, hat(w)]]."""
    hv = _hat_rows(e[:3])
    hw = _hat_rows(e[3:])
    out = [[0.0] * 6 for _ in range(6)]
    for i in range(3):
        for j in range(3):
            out[i][j] = hw[i][j]
            out[i][j + 3] = hv[i][j]
            out[i + 3][j + 3] = hw[i][j]
    return out


def _adjoint_of_inv(M):
    """Ad(M^-1) as a 6x6 row-matrix, from the [16]-row transform M."""
    Mi = _se3_inv(M)
    R = [[Mi[4 * i + j] for j in range(3)] for i in range(3)]
    t = [Mi[3], Mi[7], Mi[11]]
    tR = _mm3(_hat_rows(t), R)
    out = [[0.0] * 6 for _ in range(6)]
    for i in range(3):
        for j in range(3):
            out[i][j] = R[i][j]
            out[i][j + 3] = tR[i][j]
            out[i + 3][j + 3] = R[i][j]
    return out


# --------------------------------------------------------------------------
# Kernel
# --------------------------------------------------------------------------

def _split16(x):
    """bf16 hi/lo split via mantissa bit-masking. The astype(bf16)/upcast
    form is UNSAFE anywhere XLA may trace this (interpret mode, wrapper
    code): under ``--xla_allow_excess_precision=true`` the downcast/upcast
    pair folds to identity and ``lo`` constant-folds to zero (see
    ``ops/icp_pallas._bf16_trunc``)."""
    bits = jax.lax.bitcast_convert_type(x, jnp.uint32)
    hi_f32 = jax.lax.bitcast_convert_type(
        bits & jnp.uint32(0xFFFF0000), jnp.float32)
    hi = hi_f32.astype(jnp.bfloat16)       # exact: already on the bf16 grid
    lo = (x - hi_f32).astype(jnp.bfloat16)
    return jnp.concatenate([hi, lo], axis=0)


def _stack_rows(rows, total, like):
    rows = [_to_row(r, like) for r in rows]
    pad = total - len(rows)
    if pad:
        rows = rows + [jnp.zeros_like(like)] * pad
    return jnp.concatenate(rows, axis=0)




def _det3(A):
    """Determinant of a 3x3 row/scalar matrix."""
    return _dotn([(A[0][0], _add(_mul(A[1][1], A[2][2]),
                                 _neg(_mul(A[1][2], A[2][1])))),
                  (_neg(A[0][1]), _add(_mul(A[1][0], A[2][2]),
                                       _neg(_mul(A[1][2], A[2][0])))),
                  (A[0][2], _add(_mul(A[1][0], A[2][1]),
                                 _neg(_mul(A[1][1], A[2][0]))))])


def _polar3(G, iters: int = 12):
    """Orthogonal polar factor of a 3x3 matrix by Higham's Newton
    iteration: X <- (X + X^-T) / 2, scale-initialized. Quadratically
    convergent for well-conditioned G (the ICP cross-covariance of sane
    matches); callers must guard the degenerate/reflection cases
    (det(G) <= 0) themselves."""
    fro = jnp.sqrt(_dotn([(G[i][j], G[i][j])
                          for i in range(3) for j in range(3)]) + 1e-30)
    X = [[G[i][j] / fro for j in range(3)] for i in range(3)]
    for _ in range(iters):
        Xi = _inv3(X)
        X = [[0.5 * (X[i][j] + Xi[j][i]) for j in range(3)]
             for i in range(3)]
    return X
