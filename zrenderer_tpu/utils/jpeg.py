"""Baseline JPEG decoder — from scratch (the WIC JPEG path analog).

Supports baseline sequential DCT (SOF0): 8-bit, grayscale or YCbCr with
4:4:4 / 4:2:2 / 4:2:0 chroma subsampling, standard Huffman coding, restart
markers.  Progressive (SOF2) and arithmetic coding are not supported.

Decoding is vectorized where it counts: the IDCT runs as two 8x8 matrix
multiplies over ALL blocks at once (numpy einsum), upsampling and color
conversion are whole-plane array ops.  Only the Huffman bitstream walk is
scalar Python — fine for offline texture loading.
"""

from __future__ import annotations

import struct

import numpy as np

ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
], np.int32)

# Orthonormal 8-point DCT-III basis for the 2D inverse transform.
_K = np.arange(8)
_IDCT_M = np.cos((2 * _K[:, None] + 1) * _K[None, :] * np.pi / 16.0) * np.where(
    _K[None, :] == 0, np.sqrt(1.0 / 8.0), np.sqrt(2.0 / 8.0)
)


class _Bits:
    """MSB-first bit reader over entropy-coded data with 0xFF00 unstuffing
    and restart-marker awareness."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.n = 0

    def _fill(self) -> None:
        d = self.data
        b = d[self.pos]
        if b == 0xFF:
            nxt = d[self.pos + 1]
            if nxt == 0x00:
                self.pos += 2
            elif 0xD0 <= nxt <= 0xD7:
                raise _RestartMarker()
            else:
                # Entropy segment over-read (EOI etc.): feed zeros, the
                # spec's defined padding behavior.
                self.acc = (self.acc << 8) & 0xFFFFFFFF
                self.n += 8
                return
        else:
            self.pos += 1
        self.acc = ((self.acc << 8) | b) & 0xFFFFFFFF
        self.n += 8

    def bit(self) -> int:
        if self.n == 0:
            self._fill()
        self.n -= 1
        return (self.acc >> self.n) & 1

    def bits(self, count: int) -> int:
        v = 0
        for _ in range(count):
            v = (v << 1) | self.bit()
        return v

    def sync_restart(self) -> None:
        """Skip to just past the next RSTn marker; reset bit state."""
        d = self.data
        p = self.pos
        while not (d[p] == 0xFF and 0xD0 <= d[p + 1] <= 0xD7):
            p += 1
        self.pos = p + 2
        self.acc = 0
        self.n = 0


class _RestartMarker(Exception):
    pass


class _Huffman:
    def __init__(self, counts, symbols):
        # Canonical code -> symbol, organized per length for fast walk.
        self.lut = {}
        code = 0
        k = 0
        for length in range(1, 17):
            for _ in range(counts[length - 1]):
                self.lut[(length, code)] = symbols[k]
                k += 1
                code += 1
            code <<= 1

    def decode(self, bits: _Bits) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | bits.bit()
            sym = self.lut.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("bad Huffman code")


def _extend(v: int, t: int) -> int:
    return v - ((1 << t) - 1) if t and v < (1 << (t - 1)) else v


def decode_jpeg(data: bytes) -> np.ndarray:
    """Decode baseline JPEG bytes to (h, w, 4) uint8 RGBA."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    qtables = {}
    huff_dc = {}
    huff_ac = {}
    frame = None
    restart_interval = 0

    while pos < len(data):
        if data[pos] != 0xFF:
            pos += 1
            continue
        marker = data[pos + 1]
        pos += 2
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            continue
        (seg_len,) = struct.unpack_from(">H", data, pos)
        seg = data[pos + 2 : pos + seg_len]
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 15
                p += 1
                if pq == 0:
                    q = np.frombuffer(seg, np.uint8, 64, p).astype(np.int32)
                    p += 64
                else:
                    q = np.frombuffer(seg, ">u2", 64, p).astype(np.int32)
                    p += 128
                qtables[tq] = q
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(seg):
                tc, th = seg[p] >> 4, seg[p] & 15
                counts = list(seg[p + 1 : p + 17])
                total = sum(counts)
                symbols = list(seg[p + 17 : p + 17 + total])
                table = _Huffman(counts, symbols)
                (huff_dc if tc == 0 else huff_ac)[th] = table
                p += 17 + total
        elif marker == 0xC0:  # SOF0 baseline
            precision = seg[0]
            if precision != 8:
                raise ValueError("only 8-bit JPEG supported")
            h, w = struct.unpack_from(">HH", seg, 1)
            nc = seg[5]
            comps = []
            for c in range(nc):
                cid, hv, tq = seg[6 + 3 * c : 9 + 3 * c]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 15, "tq": tq})
            frame = {"h": h, "w": w, "comps": comps}
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA,
                        0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(
                f"unsupported JPEG frame type SOF{marker - 0xC0} "
                "(baseline sequential only)"
            )
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack_from(">H", seg, 0)
        elif marker == 0xDA:  # SOS — scan follows
            ns = seg[0]
            scan = []
            for c in range(ns):
                cs, tt = seg[1 + 2 * c], seg[2 + 2 * c]
                scan.append({"id": cs, "dc": tt >> 4, "ac": tt & 15})
            return _decode_scan(
                data, pos + seg_len, frame, scan, qtables, huff_dc, huff_ac,
                restart_interval,
            )
        pos += seg_len
    raise ValueError("no scan in JPEG")


def _decode_scan(data, pos, frame, scan, qtables, huff_dc, huff_ac,
                 restart_interval):
    comps = frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcu_w, mcu_h = 8 * hmax, 8 * vmax
    mcus_x = -(-frame["w"] // mcu_w)
    mcus_y = -(-frame["h"] // mcu_h)

    by_id = {c["id"]: c for c in comps}
    for s in scan:
        c = by_id[s["id"]]
        c["dc_t"] = huff_dc[s["dc"]]
        c["ac_t"] = huff_ac[s["ac"]]
        c["blocks"] = []  # zigzag coefficient rows, MCU order
        c["pred"] = 0

    bits = _Bits(data, pos)
    mcu_count = mcus_x * mcus_y

    def decode_block(c):
        coef = np.zeros(64, np.int32)
        t = c["dc_t"].decode(bits)
        diff = _extend(bits.bits(t), t) if t else 0
        c["pred"] += diff
        coef[0] = c["pred"]
        k = 1
        while k < 64:
            rs = c["ac_t"].decode(bits)
            r, s = rs >> 4, rs & 15
            if s == 0:
                if r == 15:
                    k += 16  # ZRL
                    continue
                break  # EOB
            k += r
            if k > 63:
                break
            coef[k] = _extend(bits.bits(s), s)
            k += 1
        c["blocks"].append(coef)

    mcu = 0
    while mcu < mcu_count:
        try:
            for c in comps:
                for _ in range(c["h"] * c["v"]):
                    decode_block(c)
        except _RestartMarker:
            # Interval boundary hit mid-fill: resync below.
            pass
        mcu += 1
        if restart_interval and mcu % restart_interval == 0 and mcu < mcu_count:
            bits.sync_restart()
            for c in comps:
                c["pred"] = 0

    # Dequantize + IDCT all blocks per component at once.
    planes = []
    for c in comps:
        blocks = np.stack(c["blocks"])  # (n, 64) zigzag
        q = qtables[c["tq"]]
        deq = np.zeros_like(blocks)
        deq[:, ZIGZAG] = blocks * q[np.newaxis, :]
        sq = deq.reshape(-1, 8, 8).astype(np.float64)
        # 2D IDCT: M @ S @ M^T with the orthonormal basis.
        spatial = np.einsum("xu,nuv,yv->nxy", _IDCT_M, sq, _IDCT_M) + 128.0
        spatial = np.clip(np.round(spatial), 0, 255).astype(np.uint8)

        # Re-tile MCU-ordered blocks into the component plane.
        ch, cv = c["h"], c["v"]
        pw, ph = 8 * ch * mcus_x, 8 * cv * mcus_y
        plane = np.zeros((ph, pw), np.uint8)
        bi = 0
        for my in range(mcus_y):
            for mx in range(mcus_x):
                for by in range(cv):
                    for bx in range(ch):
                        y0 = (my * cv + by) * 8
                        x0 = (mx * ch + bx) * 8
                        plane[y0 : y0 + 8, x0 : x0 + 8] = spatial[bi]
                        bi += 1
        # Upsample subsampled chroma to full resolution (nearest).
        if ch != hmax or cv != vmax:
            plane = np.repeat(np.repeat(plane, vmax // cv, 0), hmax // ch, 1)
        planes.append(plane[: frame["h"], : frame["w"]])

    h, w = frame["h"], frame["w"]
    if len(planes) == 1:
        rgb = np.repeat(planes[0][..., None], 3, axis=2)
    else:
        y = planes[0].astype(np.float64)
        cb = planes[1].astype(np.float64) - 128.0
        cr = planes[2].astype(np.float64) - 128.0
        r = y + 1.402 * cr
        g = y - 0.344136 * cb - 0.714136 * cr
        b = y + 1.772 * cb
        rgb = np.clip(
            np.round(np.stack([r, g, b], axis=-1)), 0, 255
        ).astype(np.uint8)
    return np.concatenate(
        [rgb, np.full((h, w, 1), 255, np.uint8)], axis=2
    )
