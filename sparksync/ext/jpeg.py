"""Baseline + progressive JPEG codec in pure numpy — no PIL, no
libjpeg.

Decoder: sequential DCT (SOF0/SOF1) AND progressive DCT (SOF2 — all
four scan kinds: DC first with point transform, DC successive-
approximation refinement, AC spectral-selection first scans with EOB
runs, AC successive-approximation refinement), 8-bit, grayscale or
YCbCr with 4:4:4 / 4:2:2 / 4:2:0 sampling and restart intervals
(DRI/RSTn with sequence verification — the camera-emitted
error-resilience layout); arithmetic coding rejected with
ValueError. Every scan accumulates
into per-component integer coefficient arrays; dequantization + IDCT
run once at EOI, so sequential and progressive streams of the same
coefficients decode to IDENTICAL pixels (the round-trip tests assert
exact equality against the baseline path).
Encoder: baseline (emit_jpeg, 4:4:4/4:2:0/4:2:2 + grayscale via
emit_gray_jpeg) and 6-scan progressive (emit_progressive_jpeg,
4:4:4/4:2:0/4:2:2: DC Al=1 + DC refine, luma AC Al=1 + AC refine,
full-precision chroma AC) with the Annex-K standard
quantization and Huffman tables (quality scales the quant tables),
used by the tests to round-trip and by resize_media to re-emit.

JPEG is lossy: round-trips are tolerance-checked, except DC-only
inputs (solid blocks), which reconstruct exactly by construction.

The IDCT/DCT are literal orthonormal DCT-II matrix products (C.T@X@C)
— numerically the textbook definition, not a fast approximation, so
decoder output is as close to the spec's real-valued IDCT as float64
gets. Per-block Python loops bound throughput; at Spark scale the
batching comes from mapInPandas rows, and a production deployment
would swap in libjpeg-turbo behind the same function signature.
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------- tables

ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
    ]
)

# Annex K luminance / chrominance quantization tables (natural order
# via zigzag applied at use sites; stored in zigzag order as in the spec)
STD_LUMA_Q = np.array(
    [
        16, 11, 10, 16, 24, 40, 51, 61, 12, 12, 14, 19, 26, 58, 60, 55,
        14, 13, 16, 24, 40, 57, 69, 56, 14, 17, 22, 29, 51, 87, 80, 62,
        18, 22, 37, 56, 68, 109, 103, 77, 24, 35, 55, 64, 81, 104, 113, 92,
        49, 64, 78, 87, 103, 121, 120, 101, 72, 92, 95, 98, 112, 100, 103, 99,
    ]
)
STD_CHROMA_Q = np.array(
    [
        17, 18, 24, 47, 99, 99, 99, 99, 18, 21, 26, 66, 99, 99, 99, 99,
        24, 26, 56, 99, 99, 99, 99, 99, 47, 66, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
    ]
)

# Annex K Huffman specs: (bits[1..16], values)
STD_DC_LUMA = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
STD_DC_CHROMA = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
STD_AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 125],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
        0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
        0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
        0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
        0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
        0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
        0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
        0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
        0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
        0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)
STD_AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 119],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
        0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
        0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
        0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
        0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
        0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
        0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
        0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
        0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
        0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
        0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
        0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
        0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)

# orthonormal DCT-II basis: C[k, n] = s(k) cos((2n+1)k pi / 16)
_C = np.zeros((8, 8))
for _k in range(8):
    _s = np.sqrt(0.125) if _k == 0 else 0.5
    for _n in range(8):
        _C[_k, _n] = _s * np.cos((2 * _n + 1) * _k * np.pi / 16.0)


def _idct2(block: np.ndarray) -> np.ndarray:
    return _C.T @ block @ _C


def _dct2(block: np.ndarray) -> np.ndarray:
    return _C @ block @ _C.T


# ---------------------------------------------------------------- huffman


class _HuffTable:
    """Canonical Huffman decode table: (length, code) -> symbol."""

    def __init__(self, bits: list[int], values: list[int]):
        self.lookup: dict[tuple[int, int], int] = {}
        code = 0
        vi = 0
        self.maxlen = 0
        for ln in range(1, 17):
            for _ in range(bits[ln - 1]):
                self.lookup[(ln, code)] = values[vi]
                vi += 1
                code += 1
                self.maxlen = ln
            code <<= 1

    def encode_map(self) -> dict[int, tuple[int, int]]:
        """symbol -> (length, code), the encoder-side view."""
        return {sym: lc for lc, sym in self.lookup.items()}


class _BitReader:
    """MSB-first entropy-segment reader with FF00 unstuffing; RST
    markers are consumed explicitly via restart() at interval
    boundaries (byte-realign + caller resets entropy state)."""

    def __init__(self, b: bytes, pos: int):
        self.b = b
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> None:
        while self.nbits <= 24:
            if self.pos >= len(self.b):
                raise ValueError("truncated JPEG entropy stream")
            byte = self.b[self.pos]
            if byte == 0xFF:
                nxt = self.b[self.pos + 1] if self.pos + 1 < len(self.b) else None
                if nxt == 0x00:
                    self.pos += 2
                else:
                    # RST / EOI / next segment: never consume — feed
                    # zero pad bits (spec F.2.2.5); the scan loop
                    # consumes RST markers via restart() at interval
                    # boundaries
                    self.acc = self.acc << 8
                    self.nbits += 8
                    continue
            else:
                self.pos += 1
            self.acc = (self.acc << 8) | byte
            self.nbits += 8

    def bits(self, n: int) -> int:
        if n == 0:
            return 0
        self._fill()
        v = (self.acc >> (self.nbits - n)) & ((1 << n) - 1)
        self.nbits -= n
        return v

    def huff(self, table: _HuffTable) -> int:
        code = 0
        for ln in range(1, 17):
            code = (code << 1) | self.bits(1)
            sym = table.lookup.get((ln, code))
            if sym is not None:
                return sym
        raise ValueError("bad Huffman code")

    def restart(self, idx: int) -> None:
        """Consume an expected RSTm marker at an interval boundary:
        discard buffered bits (the segment's pad bits plus any
        zero-fills fed at the marker — pos never advanced past it),
        verify the marker's modulo-8 sequence number, and byte-align
        after it. Entropy state (DC predictors, EOB run) is the
        CALLER's to reset."""
        self.acc = 0
        self.nbits = 0
        if (
            self.pos + 1 >= len(self.b)
            or self.b[self.pos] != 0xFF
            or not (0xD0 <= self.b[self.pos + 1] <= 0xD7)
        ):
            raise ValueError("expected JPEG restart marker")
        if self.b[self.pos + 1] - 0xD0 != idx % 8:
            raise ValueError("JPEG restart marker out of sequence")
        self.pos += 2


def _extend(v: int, size: int) -> int:
    if size == 0:
        return 0
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


# ---------------------------------------------------------------- decode


def parse_jpeg(b: bytes) -> np.ndarray:
    """Decode baseline (SOF0/1) or progressive (SOF2) JPEG bytes to
    (h, w, 3) uint8 RGB (grayscale replicates into 3 channels).
    Raises ValueError on arithmetic / hierarchical / malformed
    streams. Scans accumulate integer coefficients; dequant + IDCT
    run once at the end (identical pixels for identical coefficients
    regardless of scan structure)."""
    if len(b) < 4 or b[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG stream")
    pos = 2
    qt: dict[int, np.ndarray] = {}
    huff_dc: dict[int, _HuffTable] = {}
    huff_ac: dict[int, _HuffTable] = {}
    frame = None
    coef: dict[int, np.ndarray] = {}
    saw_scan = False
    dri = 0  # restart interval in MCUs (0 = none); DRI may change per scan
    while pos + 2 <= len(b):
        if b[pos] != 0xFF:
            raise ValueError("JPEG marker expected")
        marker = b[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            break
        if marker in (0x01,) or 0xD0 <= marker <= 0xD7:
            continue
        if pos + 2 > len(b):
            raise ValueError("truncated JPEG segment")
        ln = struct.unpack(">H", b[pos : pos + 2])[0]
        seg = b[pos + 2 : pos + ln]
        if len(seg) < ln - 2:
            raise ValueError("truncated JPEG segment")
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 0x0F
                if pq != 0:
                    raise ValueError("16-bit quant tables unsupported")
                qt[tq] = np.frombuffer(
                    seg[p + 1 : p + 65], dtype=np.uint8
                ).astype(np.float64)
                p += 65
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(seg):
                tc, th = seg[p] >> 4, seg[p] & 0x0F
                bits = list(seg[p + 1 : p + 17])
                nv = sum(bits)
                values = list(seg[p + 17 : p + 17 + nv])
                (huff_ac if tc else huff_dc)[th] = _HuffTable(bits, values)
                p += 17 + nv
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/1 baseline, SOF2 prog
            if frame is not None:
                raise ValueError("multiple SOF segments")
            prec, h, w, nc = seg[0], *struct.unpack(">HH", seg[1:5]), seg[5]
            if prec != 8 or nc not in (1, 3):
                raise ValueError(f"unsupported JPEG precision={prec} nc={nc}")
            comps = []
            for i in range(nc):
                cid, samp, tq = seg[6 + 3 * i : 9 + 3 * i]
                comps.append(
                    {"id": cid, "h": samp >> 4, "v": samp & 0x0F, "tq": tq}
                )
            frame = {
                "h": h, "w": w, "comps": comps, "prog": marker == 0xC2,
            }
            _frame_geometry(frame)
            coef = {
                c["id"]: np.zeros((c["bh"], c["bw"], 64), dtype=np.int64)
                for c in comps
            }
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise ValueError("unsupported JPEG coding (arith/hierarchical)")
        elif marker == 0xDD:  # DRI
            dri = struct.unpack(">H", seg[:2])[0]
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise ValueError("SOS before SOF")
            ns = seg[0]
            scan = []
            for i in range(ns):
                cs, tda = seg[1 + 2 * i : 3 + 2 * i]
                comp = next(c for c in frame["comps"] if c["id"] == cs)
                scan.append({**comp, "td": tda >> 4, "ta": tda & 0x0F})
            ss, se, ahal = seg[1 + 2 * ns : 4 + 2 * ns]
            ah, al = ahal >> 4, ahal & 0x0F
            data_pos = pos + ln
            _decode_scan_into(
                b, data_pos, frame, scan, huff_dc, huff_ac, coef,
                ss, se, ah, al, dri,
            )
            saw_scan = True
            pos = _entropy_end(b, data_pos)
            continue
        pos += ln
    if frame is None or not saw_scan:
        raise ValueError("JPEG has no scan")
    return _finish_frame(frame, coef, qt)


def _frame_geometry(frame) -> None:
    """Attach block-grid geometry to each component: the MCU-padded
    grid (bh, bw — interleaved addressing) and the component's true
    block dims (nbh, nbw — non-interleaved scans are NOT padded to
    MCU multiples, per spec A.2.2)."""
    comps = frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    if any(c["h"] < 1 or c["v"] < 1 or c["h"] > 4 or c["v"] > 4 for c in comps):
        raise ValueError("bad JPEG sampling factors")
    frame["hmax"], frame["vmax"] = hmax, vmax
    frame["mcux"] = -(-frame["w"] // (8 * hmax))
    frame["mcuy"] = -(-frame["h"] // (8 * vmax))
    for c in comps:
        c["bw"] = frame["mcux"] * c["h"]
        c["bh"] = frame["mcuy"] * c["v"]
        c["nbw"] = -(-(-(-frame["w"] * c["h"] // hmax)) // 8)
        c["nbh"] = -(-(-(-frame["h"] * c["v"] // vmax)) // 8)


def _entropy_end(b: bytes, pos: int) -> int:
    """First position of a real marker (not a stuffed FF00 or RST)
    after an entropy-coded segment."""
    while pos + 1 < len(b):
        if b[pos] == 0xFF:
            nxt = b[pos + 1]
            if nxt == 0x00 or 0xD0 <= nxt <= 0xD7:
                pos += 2
                continue
            return pos
        pos += 1
    return len(b)


def _decode_scan_into(b, pos, frame, scan, huff_dc, huff_ac, coef,
                      ss, se, ah, al, dri=0):
    """Decode one scan's entropy data into the per-component integer
    coefficient arrays (zigzag order). Handles the baseline full-block
    scan and all four progressive scan kinds, plus restart intervals
    (every `dri` MCUs: consume the RSTm marker, byte-align, reset DC
    predictors and the EOB run — in a non-interleaved scan the MCU is
    one block, per spec)."""
    r = _BitReader(b, pos)
    prog = frame["prog"]
    if prog and not (
        (ss == 0 and se == 0) or (0 < ss <= se <= 63)
    ):
        raise ValueError("bad progressive spectral selection")
    if prog and ss > 0 and len(scan) != 1:
        raise ValueError("progressive AC scan must be single-component")
    pred = {c["id"]: 0 for c in scan}
    eobrun = [0]
    rst = [0, 0]  # MCUs since restart, next marker sequence number

    def maybe_restart(n_total, n_done):
        rst[0] += 1
        if dri and rst[0] == dri and n_done < n_total:
            r.restart(rst[1])
            rst[0] = 0
            rst[1] += 1
            for k in pred:
                pred[k] = 0
            eobrun[0] = 0

    if len(scan) == 1:
        # non-interleaved: raster over the component's TRUE block grid
        c = scan[0]
        total = c["nbh"] * c["nbw"]
        done = 0
        for by in range(c["nbh"]):
            for bx in range(c["nbw"]):
                _decode_block_into(
                    r, c, coef[c["id"]][by, bx], huff_dc, huff_ac,
                    pred, eobrun, prog, ss, se, ah, al,
                )
                done += 1
                maybe_restart(total, done)
    else:
        total = frame["mcuy"] * frame["mcux"]
        done = 0
        for my in range(frame["mcuy"]):
            for mx in range(frame["mcux"]):
                for c in scan:
                    for by in range(c["v"]):
                        for bx in range(c["h"]):
                            _decode_block_into(
                                r, c,
                                coef[c["id"]][my * c["v"] + by,
                                              mx * c["h"] + bx],
                                huff_dc, huff_ac, pred, eobrun,
                                prog, ss, se, ah, al,
                            )
                done += 1
                maybe_restart(total, done)


def _decode_block_into(r, c, zz, huff_dc, huff_ac, pred, eobrun,
                       prog, ss, se, ah, al):
    if not prog:
        _block_full(r, huff_dc[c["td"]], huff_ac[c["ta"]], zz, pred, c["id"])
    elif ss == 0:
        if ah == 0:
            _block_dc_first(r, huff_dc[c["td"]], zz, pred, c["id"], al)
        else:
            # DC refinement: one raw bit per block, no Huffman table
            zz[0] |= r.bits(1) << al
    elif ah == 0:
        _block_ac_first(r, huff_ac[c["ta"]], zz, ss, se, al, eobrun)
    else:
        _block_ac_refine(r, huff_ac[c["ta"]], zz, ss, se, al, eobrun)


def _block_full(r, tdc, tac, zz, pred, cid):
    """Baseline sequential block: DC diff + AC run-lengths to EOB."""
    s = r.huff(tdc)
    pred[cid] += _extend(r.bits(s), s)
    zz[0] = pred[cid]
    k = 1
    while k < 64:
        rs = r.huff(tac)
        rr, s = rs >> 4, rs & 0x0F
        if s == 0:
            if rr == 15:
                k += 16
                continue
            break  # EOB
        k += rr
        if k >= 64:
            raise ValueError("AC run past block end")
        zz[k] = _extend(r.bits(s), s)
        k += 1


def _block_dc_first(r, tdc, zz, pred, cid, al):
    """Progressive DC first scan: the usual DC diff, shifted up by the
    point transform."""
    s = r.huff(tdc)
    pred[cid] += _extend(r.bits(s), s)
    zz[0] = pred[cid] << al
    # negative predictors shift fine: Python << on negatives is
    # arithmetic, matching the spec's point transform


def _block_ac_first(r, tac, zz, ss, se, al, eobrun):
    """Progressive AC first scan (Ah=0): run-lengths within the
    spectral band, with EOB-run symbols spanning blocks."""
    if eobrun[0] > 0:
        eobrun[0] -= 1
        return
    k = ss
    while k <= se:
        rs = r.huff(tac)
        rr, s = rs >> 4, rs & 0x0F
        if s == 0:
            if rr < 15:
                eobrun[0] = (1 << rr) - 1
                if rr:
                    eobrun[0] += r.bits(rr)
                break
            k += 16  # ZRL
            continue
        k += rr
        if k > se:
            raise ValueError("AC run past spectral band")
        zz[k] = _extend(r.bits(s), s) << al
        k += 1


def _block_ac_refine(r, tac, zz, ss, se, al, eobrun):
    """Progressive AC refinement (Ah>0): correction bits for already-
    nonzero coefficients, +-1<<Al insertions for newly significant
    ones, EOB runs carrying trailing corrections (spec G.1.2.3; the
    two's-complement +-(1<<Al) append trick makes the magnitude-domain
    bit append exact for negatives too)."""
    p1 = 1 << al
    m1 = -p1
    k = ss
    if eobrun[0] == 0:
        while k <= se:
            rs = r.huff(tac)
            rr, s = rs >> 4, rs & 0x0F
            val = 0
            if s == 0:
                if rr < 15:
                    eobrun[0] = 1 << rr
                    if rr:
                        eobrun[0] += r.bits(rr)
                    break  # remainder handled in the EOB sweep below
                # rr == 15: ZRL — advance over 16 zero-history coeffs
            else:
                if s != 1:
                    raise ValueError("bad AC refinement magnitude")
                val = p1 if r.bits(1) else m1
            while k <= se:
                if zz[k] != 0:
                    if r.bits(1) and (zz[k] & p1) == 0:
                        zz[k] += p1 if zz[k] >= 0 else m1
                else:
                    if rr == 0:
                        break
                    rr -= 1
                k += 1
            if val != 0:
                if k > se:
                    raise ValueError("AC refinement past band")
                zz[k] = val
            k += 1
    if eobrun[0] > 0:
        while k <= se:
            if zz[k] != 0:
                if r.bits(1) and (zz[k] & p1) == 0:
                    zz[k] += p1 if zz[k] >= 0 else m1
            k += 1
        eobrun[0] -= 1


def _finish_frame(frame, coef, qt) -> np.ndarray:
    """Dequantize + IDCT every block, upsample subsampled chroma,
    color-convert — shared by the sequential and progressive paths."""
    h, w = frame["h"], frame["w"]
    hmax, vmax = frame["hmax"], frame["vmax"]
    out = []
    for c in frame["comps"]:
        q = qt[c["tq"]]
        arr = coef[c["id"]]
        plane = np.zeros((c["bh"] * 8, c["bw"] * 8))
        for by in range(c["bh"]):
            for bx in range(c["bw"]):
                co = np.zeros(64)
                co[ZIGZAG] = arr[by, bx].astype(np.float64) * q
                plane[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = _idct2(
                    co.reshape(8, 8)
                )
        if c["h"] != hmax or c["v"] != vmax:
            plane = np.repeat(
                np.repeat(plane, hmax // c["h"], axis=1),
                vmax // c["v"], axis=0,
            )
        out.append(plane[:h, :w])
    if len(out) == 1:
        g = np.clip(out[0] + 128.0, 0, 255).astype(np.uint8)
        return np.stack([g, g, g], axis=-1)
    y, cb, cr = (out[0] + 128.0), out[1], out[2]
    rch = y + 1.402 * cr
    gch = y - 0.344136 * cb - 0.714136 * cr
    bch = y + 1.772 * cb
    return np.clip(np.stack([rch, gch, bch], axis=-1), 0, 255).astype(
        np.uint8
    )


# ---------------------------------------------------------------- encode


def _quality_scale(q: np.ndarray, quality: int) -> np.ndarray:
    quality = min(100, max(1, quality))
    s = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip((q * s + 50) // 100, 1, 255)


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def put(self, code: int, n: int) -> None:
        self.acc = (self.acc << n) | code
        self.nbits += n
        while self.nbits >= 8:
            byte = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:
                self.out.append(0x00)
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.put((1 << pad) - 1, pad)


def _subsample_chroma(subsampling: str, cb, cr, h: int, w: int):
    """Shared chroma layout stage for both encoders: sampling factors
    plus box-downsampled chroma planes. 444 = full-res; 420 = 2x2
    boxes (the web default); 422 = horizontal 1x2 boxes (the broadcast
    /camera default — full vertical chroma)."""
    if subsampling == "444":
        return [(1, 1), (1, 1), (1, 1)], cb, cr
    if subsampling == "420":
        eh, ew = -(-h // 2) * 2, -(-w // 2) * 2
        cb = _pad_plane(cb, eh, ew).reshape(eh // 2, 2, ew // 2, 2).mean(
            axis=(1, 3)
        )
        cr = _pad_plane(cr, eh, ew).reshape(eh // 2, 2, ew // 2, 2).mean(
            axis=(1, 3)
        )
        return [(2, 2), (1, 1), (1, 1)], cb, cr
    if subsampling == "422":
        ew = -(-w // 2) * 2
        cb = _pad_plane(cb, h, ew).reshape(h, ew // 2, 2).mean(axis=2)
        cr = _pad_plane(cr, h, ew).reshape(h, ew // 2, 2).mean(axis=2)
        return [(2, 1), (1, 1), (1, 1)], cb, cr
    raise ValueError("subsampling must be '444', '420' or '422'")


def _pad_plane(p: np.ndarray, ph: int, pw: int) -> np.ndarray:
    """Edge-replicate pad to (ph, pw) so padding never rings."""
    h, w = p.shape
    pp = np.zeros((ph, pw))
    pp[:h, :w] = p
    if h < ph:
        pp[h:, :w] = p[-1:, :]
    if w < pw:
        pp[:, w:] = pp[:, w - 1 : w]
    return pp


def emit_jpeg(
    arr: np.ndarray, quality: int = 90, subsampling: str = "444",
    restart_interval: int = 0
) -> bytes:
    """Encode (h, w, 3) uint8 RGB as baseline JPEG with the Annex-K
    standard tables (quality scales quantization). subsampling='444'
    keeps full-resolution chroma; '420' downsamples chroma 2x2 (the
    web's dominant layout) — which is also how the decoder's chroma
    upsampling path gets exercised by our own tests. restart_interval
    > 0 writes a DRI segment and an RSTm marker every N MCUs with DC
    predictors reset — the error-resilience layout cameras emit."""
    h, w = arr.shape[:2]
    a = arr.astype(np.float64)
    y = 0.299 * a[..., 0] + 0.587 * a[..., 1] + 0.114 * a[..., 2] - 128.0
    cb = -0.168736 * a[..., 0] - 0.331264 * a[..., 1] + 0.5 * a[..., 2]
    cr = 0.5 * a[..., 0] - 0.418688 * a[..., 1] - 0.081312 * a[..., 2]
    qy = _quality_scale(STD_LUMA_Q.astype(np.int64), quality)
    qc = _quality_scale(STD_CHROMA_Q.astype(np.int64), quality)
    dc_l, ac_l = _HuffTable(*STD_DC_LUMA), _HuffTable(*STD_AC_LUMA)
    dc_c, ac_c = _HuffTable(*STD_DC_CHROMA), _HuffTable(*STD_AC_CHROMA)
    enc_dc = [dc_l.encode_map(), dc_c.encode_map(), dc_c.encode_map()]
    enc_ac = [ac_l.encode_map(), ac_c.encode_map(), ac_c.encode_map()]
    qt = [qy, qc, qc]
    sampv, cb, cr = _subsample_chroma(subsampling, cb, cr, h, w)
    hmax = max(sh for sh, _ in sampv)
    vmax = max(sv for _, sv in sampv)
    mcux, mcuy = -(-w // (8 * hmax)), -(-h // (8 * vmax))
    planes = []
    for ci, p in enumerate((y, cb, cr)):
        sh, sv = sampv[ci]
        planes.append(_pad_plane(p, mcuy * sv * 8, mcux * sh * 8))
    bw = _BitWriter()
    pred = [0, 0, 0]
    mcu_done = 0
    rst_seq = 0
    for my in range(mcuy):
        for mx in range(mcux):
            for ci in range(3):
                sh, sv = sampv[ci]
                for by in range(sv):
                    for bx in range(sh):
                        y0 = (my * sv + by) * 8
                        x0 = (mx * sh + bx) * 8
                        blk = planes[ci][y0 : y0 + 8, x0 : x0 + 8]
                        coef = _dct2(blk)
                        zz = coef.reshape(-1)[ZIGZAG]
                        qzz = np.round(
                            zz / qt[ci].astype(np.float64)
                        ).astype(int)
                        _encode_block(
                            bw, qzz, pred, ci, enc_dc[ci], enc_ac[ci]
                        )
            mcu_done += 1
            if (
                restart_interval
                and mcu_done % restart_interval == 0
                and mcu_done < mcux * mcuy
            ):
                bw.flush()
                bw.out += bytes([0xFF, 0xD0 + rst_seq % 8])
                rst_seq += 1
                pred = [0, 0, 0]
    bw.flush()

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">BBH", 0xFF, marker, len(body) + 2) + body

    out = bytearray(b"\xff\xd8")
    out += seg(0xDB, bytes([0]) + bytes(qy.astype(np.uint8)))
    out += seg(0xDB, bytes([1]) + bytes(qc.astype(np.uint8)))
    sof = struct.pack(">BHHB", 8, h, w, 3)
    for ci, (cid, tq) in enumerate(((1, 0), (2, 1), (3, 1))):
        sh, sv = sampv[ci]
        sof += bytes([cid, (sh << 4) | sv, tq])
    out += seg(0xC0, sof)
    for tcth, (bits, values) in (
        (0x00, STD_DC_LUMA), (0x10, STD_AC_LUMA),
        (0x01, STD_DC_CHROMA), (0x11, STD_AC_CHROMA),
    ):
        out += seg(0xC4, bytes([tcth]) + bytes(bits) + bytes(values))
    if restart_interval:
        out += seg(0xDD, struct.pack(">H", restart_interval))
    sos = bytes([3]) + bytes([1, 0x00, 2, 0x11, 3, 0x11]) + bytes([0, 63, 0])
    out += seg(0xDA, sos)
    out += bw.out
    out += b"\xff\xd9"
    return bytes(out)


def _encode_block(bw, qzz, pred, ci, dc_map, ac_map):
    diff = int(qzz[0]) - pred[ci]
    pred[ci] = int(qzz[0])
    s = int(diff).bit_length() if diff != 0 else 0
    mag = diff if diff >= 0 else diff + (1 << s) - 1
    ln, code = dc_map[s]
    bw.put(code, ln)
    if s:
        bw.put(mag & ((1 << s) - 1), s)
    run = 0
    last_nz = 0
    for k in range(63, 0, -1):
        if qzz[k] != 0:
            last_nz = k
            break
    for k in range(1, last_nz + 1):
        v = int(qzz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            ln, code = ac_map[0xF0]
            bw.put(code, ln)
            run -= 16
        s = abs(v).bit_length()
        mag = v if v >= 0 else v + (1 << s) - 1
        ln, code = ac_map[(run << 4) | s]
        bw.put(code, ln)
        bw.put(mag & ((1 << s) - 1), s)
        run = 0
    if last_nz < 63:
        ln, code = ac_map[0x00]
        bw.put(code, ln)


def _quantized_blocks(arr: np.ndarray, quality: int,
                      subsampling: str = "444"):
    """Forward path shared with the progressive encoder: RGB ->
    YCbCr (box-downsampled chroma at 4:2:0) -> per-8x8 DCT -> Annex-K
    quantization. Per component, a dict with the MCU-padded zigzag
    coefficient grid `qzz` ((bh, bw, 64) ints — what interleaved DC
    scans walk), the sampling factors (sh, sv), and the TRUE block
    dims (nbh, nbw — what non-interleaved AC scans walk, per spec
    A.2.2). Returns (comps, qy, qc)."""
    h, w = arr.shape[:2]
    a = arr.astype(np.float64)
    y = 0.299 * a[..., 0] + 0.587 * a[..., 1] + 0.114 * a[..., 2] - 128.0
    cb = -0.168736 * a[..., 0] - 0.331264 * a[..., 1] + 0.5 * a[..., 2]
    cr = 0.5 * a[..., 0] - 0.418688 * a[..., 1] - 0.081312 * a[..., 2]
    qy = _quality_scale(STD_LUMA_Q.astype(np.int64), quality)
    qc = _quality_scale(STD_CHROMA_Q.astype(np.int64), quality)
    qt = [qy, qc, qc]
    sampv, cb, cr = _subsample_chroma(subsampling, cb, cr, h, w)
    hmax = max(sh for sh, _ in sampv)
    vmax = max(sv for _, sv in sampv)
    mcux, mcuy = -(-w // (8 * hmax)), -(-h // (8 * vmax))
    comps = []
    for ci, p in enumerate((y, cb, cr)):
        sh, sv = sampv[ci]
        bw_, bh_ = mcux * sh, mcuy * sv
        pp = _pad_plane(p, bh_ * 8, bw_ * 8)
        qzz = np.zeros((bh_, bw_, 64), dtype=np.int64)
        for by in range(bh_):
            for bx in range(bw_):
                coefs = _dct2(pp[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8])
                qzz[by, bx] = np.round(
                    coefs.reshape(-1)[ZIGZAG] / qt[ci].astype(np.float64)
                ).astype(np.int64)
        comps.append({
            "qzz": qzz, "sh": sh, "sv": sv,
            "nbw": -(-(-(-w * sh // hmax)) // 8),
            "nbh": -(-(-(-h * sv // vmax)) // 8),
        })
    return comps, qy, qc


class _ScanWriter:
    """Entropy writer for one progressive scan: wraps _BitWriter with
    the EOB-run buffering both AC scan kinds need (pending EOB count
    plus the correction bits that ride with it in refinement scans)."""

    def __init__(self, ac_map):
        self.bw = _BitWriter()
        self.ac_map = ac_map
        self.eobrun = 0
        self.pending_bits: list[int] = []

    def sym(self, symbol: int) -> None:
        ln, code = self.ac_map[symbol]
        self.bw.put(code, ln)

    def flush_eob(self) -> None:
        if self.eobrun > 0:
            r = self.eobrun.bit_length() - 1
            self.sym(r << 4)
            if r:
                self.bw.put(self.eobrun - (1 << r), r)
            self.eobrun = 0
        for bit in self.pending_bits:
            self.bw.put(bit, 1)
        self.pending_bits = []

    def add_eob(self, corrections: list[int]) -> None:
        self.eobrun += 1
        self.pending_bits.extend(corrections)
        if self.eobrun == 0x7FFF:
            self.flush_eob()

    def restart(self, rst_seq: int) -> None:
        """Interval boundary: flush the pending EOB run + buffered
        bits, byte-align, write the RSTm marker. Entropy state resets
        by construction (eobrun/pending are now empty)."""
        self.flush_eob()
        _emit_restart(self.bw, rst_seq)

    def finish(self) -> bytes:
        self.flush_eob()
        self.bw.flush()
        return bytes(self.bw.out)


def _mcu_blocks(comps):
    """Yield (mcu_index, n_mcus, ci, by, bx) in interleaved MCU order
    — per MCU, each component contributes sv x sh blocks of its padded
    grid (the same walk the decoder's interleaved path performs); the
    MCU index lets callers place restart markers at interval
    boundaries."""
    sv0, sh0 = comps[0]["sv"], comps[0]["sh"]
    mcuy = comps[0]["qzz"].shape[0] // sv0
    mcux = comps[0]["qzz"].shape[1] // sh0
    n = mcuy * mcux
    for my in range(mcuy):
        for mx in range(mcux):
            m = my * mcux + mx
            for ci, c in enumerate(comps):
                for by in range(c["sv"]):
                    for bx in range(c["sh"]):
                        yield m, n, ci, my * c["sv"] + by, mx * c["sh"] + bx


def _emit_restart(bw, rst_seq: int) -> None:
    bw.flush()
    bw.out += bytes([0xFF, 0xD0 + rst_seq % 8])


def _encode_dc_first(comps, enc_dc, al, dri=0) -> bytes:
    """Interleaved DC first scan at point transform Al (any sampling:
    4:2:0 MCUs carry four luma blocks then one of each chroma), with
    optional restart markers every dri MCUs."""
    bw = _BitWriter()
    pred = [0] * len(comps)
    last_m = -1
    rst = 0
    for m, n, ci, by, bx in _mcu_blocks(comps):
        if m != last_m and last_m >= 0 and dri and m % dri == 0:
            _emit_restart(bw, rst)
            rst += 1
            pred = [0] * len(comps)
        last_m = m
        v = int(comps[ci]["qzz"][by, bx, 0]) >> al  # arithmetic, per spec
        diff = v - pred[ci]
        pred[ci] = v
        s = abs(diff).bit_length()
        mag = diff if diff >= 0 else diff + (1 << s) - 1
        ln, code = enc_dc[ci][s]
        bw.put(code, ln)
        if s:
            bw.put(mag & ((1 << s) - 1), s)
    bw.flush()
    return bytes(bw.out)


def _encode_dc_refine(comps, al, dri=0) -> bytes:
    """DC refinement: the Al-th bit of each block's DC, interleaved;
    no Huffman coding at all (restart markers still byte-align)."""
    bw = _BitWriter()
    last_m = -1
    rst = 0
    for m, n, ci, by, bx in _mcu_blocks(comps):
        if m != last_m and last_m >= 0 and dri and m % dri == 0:
            _emit_restart(bw, rst)
            rst += 1
        last_m = m
        bw.put((int(comps[ci]["qzz"][by, bx, 0]) >> al) & 1, 1)
    bw.flush()
    return bytes(bw.out)


def _encode_ac_first(comp, ac_map, ss, se, al, dri=0) -> bytes:
    """Single-component AC first scan: run-lengths of the point-
    transformed band with cross-block EOB runs. Walks the component's
    TRUE block grid (nbh x nbw) — non-interleaved scans are not padded
    to MCU multiples (spec A.2.2), exactly what the decoder reads."""
    sw = _ScanWriter(ac_map)
    qzz = comp["qzz"]
    total = comp["nbh"] * comp["nbw"]
    done = 0
    rst = 0
    for by in range(comp["nbh"]):
        for bx in range(comp["nbw"]):
            if dri and done and done % dri == 0:
                sw.restart(rst)
                rst += 1
            done += 1
            blk = qzz[by, bx]
            vals = {}
            for k in range(ss, se + 1):
                c = int(blk[k])
                t = (abs(c) >> al)
                if t:
                    vals[k] = t if c >= 0 else -t
            if not vals:
                sw.add_eob([])
                continue
            sw.flush_eob()
            last = max(vals)
            run = 0
            for k in range(ss, last + 1):
                v = vals.get(k)
                if v is None:
                    run += 1
                    continue
                while run > 15:
                    sw.sym(0xF0)
                    run -= 16
                s = abs(v).bit_length()
                mag = v if v >= 0 else v + (1 << s) - 1
                sw.sym((run << 4) | s)
                sw.bw.put(mag & ((1 << s) - 1), s)
                run = 0
            if last < se:
                sw.add_eob([])
    return sw.finish()


def _encode_ac_refine(comp, ac_map, ss, se, al, dri=0) -> bytes:
    """Single-component AC refinement scan (spec G.1.2.3): +-1
    insertions for newly significant coefficients, buffered correction
    bits for already-significant ones, EOB runs carrying the trailing
    corrections — the exact inverse of _block_ac_refine. Walks the
    TRUE block grid like _encode_ac_first."""
    sw = _ScanWriter(ac_map)
    qzz = comp["qzz"]
    total = comp["nbh"] * comp["nbw"]
    done = 0
    rst = 0
    for by in range(comp["nbh"]):
        for bx in range(comp["nbw"]):
            if dri and done and done % dri == 0:
                sw.restart(rst)
                rst += 1
            done += 1
            blk = qzz[by, bx]
            absv = [abs(int(blk[k])) >> al for k in range(ss, se + 1)]
            # EOB position: after the LAST newly-significant coefficient
            last_new = -1
            for i, t in enumerate(absv):
                if t == 1:
                    last_new = i
            run = 0
            corrections: list[int] = []
            for i, t in enumerate(absv):
                if i > last_new:
                    # tail: zeros fold into the EOB run; corrections for
                    # already-significant coeffs ride with it
                    if t > 1:
                        corrections.append(t & 1)
                    continue
                if t == 0:
                    run += 1
                    continue
                # ZRL boundaries must be emitted at EVERY nonzero
                # coefficient (correction or insertion) so the decoder
                # consumes buffered correction bits in positional order
                # while crossing each 16-zero span (jcphuff ordering —
                # flushing only at insertions interleaves wrongly when
                # corrections sit among >16 zeros)
                while run > 15:
                    sw.flush_eob()
                    sw.sym(0xF0)
                    for bit in corrections:
                        sw.bw.put(bit, 1)
                    corrections = []
                    run -= 16
                if t > 1:
                    corrections.append(t & 1)
                    continue
                # newly significant
                sw.flush_eob()
                sw.sym((run << 4) | 1)
                sw.bw.put(1 if int(blk[ss + i]) >= 0 else 0, 1)
                for bit in corrections:
                    sw.bw.put(bit, 1)
                corrections = []
                run = 0
            if last_new < len(absv) - 1 or corrections:
                sw.add_eob(corrections)
    return sw.finish()


# Progressive AC scans need EOBn symbols (0x10..0xE0), which the
# Annex-K baseline AC tables do not define — real encoders ship custom
# tables in every progressive file. This one is deliberately simple:
# every symbol we can emit (EOB0..EOB14, ZRL, and run 0-15 x size 1-12)
# at a flat 8-bit code length — 208 symbols, Kraft sum 208/256 <= 1,
# so it is a valid canonical table any decoder accepts (bigger files
# than an optimized table, which is irrelevant for a codec-parity test
# path).
PROG_AC_SPEC = (
    [0] * 7 + [208] + [0] * 8,
    [r << 4 for r in range(15)]        # EOB0..EOB14
    + [0xF0]                            # ZRL
    + [(r << 4) | s for r in range(16) for s in range(1, 13)],
)


def emit_progressive_jpeg(
    arr: np.ndarray, quality: int = 90, subsampling: str = "444",
    restart_interval: int = 0
) -> bytes:
    """Encode (h, w, 3) uint8 RGB as a 6-scan progressive (SOF2) JPEG
    carrying EXACTLY the same quantized coefficients as emit_jpeg at
    the same quality and subsampling — entropy coding is lossless, so
    parse_jpeg must decode both to identical pixels (asserted by the
    round-trip tests). subsampling='420' (the web's dominant
    progressive layout) interleaves four luma blocks per MCU in the DC
    scans and walks TRUE (unpadded) chroma block grids in the AC scans.
    Scan script exercises every progressive decode path: DC first at
    Al=1 + DC refinement, luma AC spectral band at Al=1 + AC
    refinement (insertions, correction bits, EOB runs), and
    full-precision chroma AC scans."""
    h, w = arr.shape[:2]
    comps, qy, qc = _quantized_blocks(arr, quality, subsampling)
    dc_l = _HuffTable(*STD_DC_LUMA)
    dc_c = _HuffTable(*STD_DC_CHROMA)
    ac_p = _HuffTable(*PROG_AC_SPEC)
    enc_dc = [dc_l.encode_map(), dc_c.encode_map(), dc_c.encode_map()]
    ac_map = ac_p.encode_map()

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">BBH", 0xFF, marker, len(body) + 2) + body

    def sos(scomps: list, ss: int, se: int, ah: int, al: int) -> bytes:
        body = bytes([len(scomps)])
        for cid, td, ta in scomps:
            body += bytes([cid, (td << 4) | ta])
        body += bytes([ss, se, (ah << 4) | al])
        return seg(0xDA, body)

    out = bytearray(b"\xff\xd8")
    out += seg(0xDB, bytes([0]) + bytes(qy.astype(np.uint8)))
    out += seg(0xDB, bytes([1]) + bytes(qc.astype(np.uint8)))
    sof = struct.pack(">BHHB", 8, h, w, 3)
    for ci, (cid, tq) in enumerate(((1, 0), (2, 1), (3, 1))):
        samp = (comps[ci]["sh"] << 4) | comps[ci]["sv"]
        sof += bytes([cid, samp, tq])
    out += seg(0xC2, sof)
    for tcth, (bits, values) in (
        (0x00, STD_DC_LUMA), (0x01, STD_DC_CHROMA),
        (0x10, PROG_AC_SPEC),
    ):
        out += seg(0xC4, bytes([tcth]) + bytes(bits) + bytes(values))
    dri = restart_interval
    if dri:
        out += seg(0xDD, struct.pack(">H", dri))
    # scan 1+2: DC at Al=1, then the refinement bit
    out += sos([(1, 0, 0), (2, 1, 0), (3, 1, 0)], 0, 0, 0, 1)
    out += _encode_dc_first(comps, enc_dc, 1, dri)
    out += sos([(1, 0, 0), (2, 1, 0), (3, 1, 0)], 0, 0, 1, 0)
    out += _encode_dc_refine(comps, 0, dri)
    # scan 3+4: luma AC band at Al=1, then its refinement
    out += sos([(1, 0, 0)], 1, 63, 0, 1)
    out += _encode_ac_first(comps[0], ac_map, 1, 63, 1, dri)
    out += sos([(1, 0, 0)], 1, 63, 1, 0)
    out += _encode_ac_refine(comps[0], ac_map, 1, 63, 0, dri)
    # scans 5+6: chroma AC at full precision (AC table 0 is the shared
    # progressive table)
    for ci, cid in ((1, 2), (2, 3)):
        out += sos([(cid, 0, 0)], 1, 63, 0, 0)
        out += _encode_ac_first(comps[ci], ac_map, 1, 63, 0, dri)
    out += b"\xff\xd9"
    return bytes(out)


def emit_gray_jpeg(arr: np.ndarray, quality: int = 90) -> bytes:
    """Encode a 2-D uint8 array as a single-component (grayscale)
    baseline JPEG — exercises the decoder's 1-component path (scanner
    and fax outputs), which parse_jpeg replicates into 3 channels."""
    if arr.ndim != 2:
        raise ValueError("emit_gray_jpeg takes a 2-D array")
    h, w = arr.shape
    y = arr.astype(np.float64) - 128.0
    qy = _quality_scale(STD_LUMA_Q.astype(np.int64), quality)
    dc_l, ac_l = _HuffTable(*STD_DC_LUMA), _HuffTable(*STD_AC_LUMA)
    dc_map, ac_map = dc_l.encode_map(), ac_l.encode_map()
    nbx, nby = -(-w // 8), -(-h // 8)
    pp = _pad_plane(y, nby * 8, nbx * 8)
    bw = _BitWriter()
    pred = [0]
    for by in range(nby):
        for bx in range(nbx):
            coefs = _dct2(pp[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8])
            qzz = np.round(
                coefs.reshape(-1)[ZIGZAG] / qy.astype(np.float64)
            ).astype(int)
            _encode_block(bw, qzz, pred, 0, dc_map, ac_map)
    bw.flush()

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">BBH", 0xFF, marker, len(body) + 2) + body

    out = bytearray(b"\xff\xd8")
    out += seg(0xDB, bytes([0]) + bytes(qy.astype(np.uint8)))
    out += seg(0xC0, struct.pack(">BHHB", 8, h, w, 1) + bytes([1, 0x11, 0]))
    for tcth, (bits, values) in (
        (0x00, STD_DC_LUMA), (0x10, STD_AC_LUMA),
    ):
        out += seg(0xC4, bytes([tcth]) + bytes(bits) + bytes(values))
    out += seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
    out += bw.out
    out += b"\xff\xd9"
    return bytes(out)


def jpeg_features(b: bytes) -> dict:
    """REAL image features from baseline JPEG bytes."""
    a = parse_jpeg(b)
    m = a.reshape(-1, 3).mean(axis=0)
    return {
        "img_width": int(a.shape[1]),
        "img_height": int(a.shape[0]),
        "mean_r": float(m[0]),
        "mean_g": float(m[1]),
        "mean_b": float(m[2]),
    }


def resize_jpeg(b: bytes, width: int, height: int, quality: int = 90) -> bytes:
    """Decode -> nearest-neighbor -> re-encode baseline 4:4:4."""
    a = parse_jpeg(b)
    h, w = a.shape[:2]
    yi = (np.arange(height) * h // height).clip(0, h - 1)
    xi = (np.arange(width) * w // width).clip(0, w - 1)
    return emit_jpeg(a[yi][:, xi], quality=quality)
