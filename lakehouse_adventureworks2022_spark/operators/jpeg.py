"""Baseline JPEG codec in numpy + stdlib — no PIL/libjpeg.

Decoder: baseline sequential DCT (SOF0), 8-bit, Huffman entropy coding,
grayscale / 4:4:4 / 4:2:0 (and any h,v ≤ 2 sampling), restart markers,
byte stuffing. Encoder: 4:4:4 baseline with the Annex K example quant
tables (IJG quality scaling) and the Annex K typical Huffman tables —
enough to produce spec-conformant files for the decoder AND any other
baseline decoder.

Progressive (SOF2), arithmetic coding, and 12-bit precision raise a
named ``NotImplementedError`` — the same honesty contract as the other
codecs in ``operators/multimodal.py``.

Worker portability: the public ``decode_jpeg``/``encode_jpeg`` are
closures built by factories (non-importable qualnames ⇒ cloudpickle
ships them BY VALUE), so ``mapInPandas`` stages can call them on
workers that cannot import this package — see
tests/test_worker_portability.py and the memory of the r6 PNG
regression.

References: ITU-T T.81 (the JPEG spec, public), IJG quality scaling
(public libjpeg documentation). Implementation is original.
"""

from __future__ import annotations

#: 8×8 zigzag order (T.81 Figure 5) as a flat index list.
ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]

#: Annex K.1 example quantization tables (luminance, chrominance).
QUANT_LUMA = [
    16, 11, 10, 16, 24, 40, 51, 61, 12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56, 14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77, 24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101, 72, 92, 95, 98, 112, 100, 103, 99,
]
QUANT_CHROMA = [
    17, 18, 24, 47, 99, 99, 99, 99, 18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99, 47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
]

#: Annex K.3 typical Huffman tables: (bits[1..16], values).
DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_LUMA_VALS = list(range(12))
DC_CHROMA_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
DC_CHROMA_VALS = list(range(12))
AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_LUMA_VALS = [
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
]
AC_CHROMA_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
AC_CHROMA_VALS = [
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
]

JPEG_MAGIC = b"\xff\xd8\xff"


def build_jpeg_decoder():
    """Factory returning the baseline JPEG decoder as a by-value
    closure (see module doc for why it must not be a module-level
    function)."""
    zigzag = list(ZIGZAG)

    def decode_jpeg(data: bytes):
        import struct

        import numpy as np

        if data[:3] != b"\xff\xd8\xff":
            raise ValueError("not a JPEG (bad SOI)")

        # DCT-III (IDCT) basis matrix, orthonormal
        k = np.arange(8)
        basis = np.cos((2 * k[:, None] + 1) * k[None, :] * np.pi / 16)
        alpha = np.full(8, np.sqrt(2.0 / 8.0))
        alpha[0] = np.sqrt(1.0 / 8.0)
        idct_m = basis * alpha[None, :]  # x = M @ X @ M.T

        qt: dict = {}
        huff: dict = {}  # (class, id) -> dict code-> (length ok) lookup
        frame = None
        restart_interval = 0

        def build_huff(bits, vals):
            # map (length, code) -> value
            table = {}
            code = 0
            i = 0
            for ln in range(1, 17):
                for _ in range(bits[ln - 1]):
                    table[(ln, code)] = vals[i]
                    code += 1
                    i += 1
                code <<= 1
            return table

        pos = 2
        scan = None
        while pos < len(data):
            if data[pos] != 0xFF:
                raise ValueError(f"marker expected at {pos}")
            marker = data[pos + 1]
            pos += 2
            if marker == 0xD8:
                continue
            if marker == 0xD9:
                break
            (seglen,) = struct.unpack(">H", data[pos : pos + 2])
            seg = data[pos + 2 : pos + seglen]
            if marker == 0xDB:  # DQT
                p = 0
                while p < len(seg):
                    pq, tq = seg[p] >> 4, seg[p] & 0xF
                    p += 1
                    if pq:
                        raise NotImplementedError("16-bit quant tables")
                    qt[tq] = np.array(list(seg[p : p + 64]), dtype=np.int32)
                    p += 64
            elif marker in (0xC0, 0xC1):  # SOF0/1 baseline
                prec, h, w, nc = seg[0], *struct.unpack(">HH", seg[1:5]), seg[5]
                if prec != 8:
                    raise NotImplementedError(f"{prec}-bit JPEG")
                comps = []
                for c in range(nc):
                    cid, hv, tq = seg[6 + c * 3 : 9 + c * 3]
                    comps.append(
                        {"id": cid, "h": hv >> 4, "v": hv & 0xF, "tq": tq}
                    )
                frame = {"h": h, "w": w, "comps": comps}
            elif marker == 0xC2:
                raise NotImplementedError("progressive JPEG (SOF2)")
            elif marker in (0xC9, 0xCA, 0xCB):
                raise NotImplementedError("arithmetic-coded JPEG")
            elif marker == 0xC4:  # DHT
                p = 0
                while p < len(seg):
                    tc, th = seg[p] >> 4, seg[p] & 0xF
                    bits = list(seg[p + 1 : p + 17])
                    nvals = sum(bits)
                    vals = list(seg[p + 17 : p + 17 + nvals])
                    huff[(tc, th)] = build_huff(bits, vals)
                    p += 17 + nvals
            elif marker == 0xDD:  # DRI
                (restart_interval,) = struct.unpack(">H", seg[:2])
            elif marker == 0xDA:  # SOS
                ns = seg[0]
                scan_comps = []
                for c in range(ns):
                    cs, tables = seg[1 + c * 2 : 3 + c * 2]
                    scan_comps.append((cs, tables >> 4, tables & 0xF))
                scan = (scan_comps, pos + seglen)
                break
            # APPn/COM/etc.: skip
            pos += seglen
        if frame is None or scan is None:
            raise ValueError("JPEG missing SOF/SOS")

        scan_comps, pos = scan
        h, w, comps = frame["h"], frame["w"], frame["comps"]
        hmax = max(c["h"] for c in comps)
        vmax = max(c["v"] for c in comps)
        mcux = -(-w // (8 * hmax))
        mcuy = -(-h // (8 * vmax))

        # entropy-coded bitstream with stuffing/restarts stripped lazily
        bitpos = 0
        bytepos = pos

        def read_bit():
            nonlocal bitpos, bytepos
            b = data[bytepos]
            if b == 0xFF:
                nxt = data[bytepos + 1]
                if nxt not in (0x00,):  # marker: should not be read as bits
                    raise ValueError("hit marker inside entropy data")
            bit = (b >> (7 - bitpos)) & 1
            bitpos += 1
            if bitpos == 8:
                bitpos = 0
                bytepos += 1
                if b == 0xFF:  # skip stuffed 0x00
                    bytepos += 1
            return bit

        def decode_sym(table):
            ln, code = 0, 0
            while ln < 16:
                code = (code << 1) | read_bit()
                ln += 1
                if (ln, code) in table:
                    return table[(ln, code)]
            raise ValueError("bad Huffman code")

        def receive_extend(s):
            if s == 0:
                return 0
            v = 0
            for _ in range(s):
                v = (v << 1) | read_bit()
            if v < (1 << (s - 1)):
                v -= (1 << s) - 1
            return v

        def sync_restart():
            nonlocal bitpos, bytepos
            if bitpos:
                bitpos = 0
                bytepos += 1
            # scan to the RSTn marker: the flush byte before it may have
            # been 0xFF (1-padded) and therefore stuffed as FF 00
            while bytepos + 1 < len(data):
                if data[bytepos] == 0xFF and 0xD0 <= data[bytepos + 1] <= 0xD7:
                    bytepos += 2
                    return
                bytepos += 1
            raise ValueError("restart marker expected, hit end of data")

        planes = {
            c["id"]: np.zeros(
                (mcuy * c["v"] * 8, mcux * c["h"] * 8), dtype=np.float64
            )
            for c in comps
        }
        pred = {c["id"]: 0 for c in comps}
        by_id = {c["id"]: c for c in comps}
        n_mcu = 0
        for my in range(mcuy):
            for mx in range(mcux):
                if restart_interval and n_mcu and n_mcu % restart_interval == 0:
                    sync_restart()
                    for cid in pred:
                        pred[cid] = 0
                n_mcu += 1
                for cs, tdc, tac in scan_comps:
                    comp = by_id[cs]
                    for by in range(comp["v"]):
                        for bx in range(comp["h"]):
                            zz = np.zeros(64, dtype=np.float64)
                            s = decode_sym(huff[(0, tdc)])
                            diff = receive_extend(s)
                            pred[cs] += diff
                            zz[0] = pred[cs]
                            kpos = 1
                            while kpos < 64:
                                rs = decode_sym(huff[(1, tac)])
                                r, sz = rs >> 4, rs & 0xF
                                if sz == 0:
                                    if r == 15:
                                        kpos += 16
                                        continue
                                    break  # EOB
                                kpos += r
                                zz[kpos] = receive_extend(sz)
                                kpos += 1
                            # dequantize in zigzag order (DQT is stored
                            # zigzag per spec), then unzigzag
                            deq = zz * qt[comp["tq"]].astype(np.float64)
                            blk = np.zeros(64, dtype=np.float64)
                            blk[zigzag] = deq
                            mat = blk.reshape(8, 8)
                            px = idct_m @ mat @ idct_m.T + 128.0
                            y0 = (my * comp["v"] + by) * 8
                            x0 = (mx * comp["h"] + bx) * 8
                            planes[cs][y0 : y0 + 8, x0 : x0 + 8] = px
        # upsample to full resolution and crop
        full = []
        for comp in comps:
            p = planes[comp["id"]]
            ry, rx = vmax // comp["v"], hmax // comp["h"]
            if ry > 1 or rx > 1:
                p = np.repeat(np.repeat(p, ry, axis=0), rx, axis=1)
            full.append(p[:h, :w])
        if len(full) == 1:
            y = np.clip(full[0], 0, 255)
            g = y.astype(np.uint8)
            return np.dstack([g, g, g])
        y, cb, cr = full[0], full[1] - 128.0, full[2] - 128.0
        r = y + 1.402 * cr
        g = y - 0.344136 * cb - 0.714136 * cr
        b = y + 1.772 * cb
        return np.clip(np.dstack([r, g, b]), 0, 255).astype(np.uint8)

    return decode_jpeg


def build_jpeg_encoder():
    """Factory returning a minimal baseline 4:4:4 encoder (Annex K
    tables, IJG quality scaling) as a by-value closure."""
    zigzag = list(ZIGZAG)
    ql, qc = list(QUANT_LUMA), list(QUANT_CHROMA)
    tables = {
        "dc0": (list(DC_LUMA_BITS), list(DC_LUMA_VALS)),
        "ac0": (list(AC_LUMA_BITS), list(AC_LUMA_VALS)),
        "dc1": (list(DC_CHROMA_BITS), list(DC_CHROMA_VALS)),
        "ac1": (list(AC_CHROMA_BITS), list(AC_CHROMA_VALS)),
    }

    def encode_jpeg(
        arr,
        quality: int = 85,
        subsampling: str = "444",
        restart_interval: int = 0,
        grayscale: bool = False,
    ) -> bytes:
        import struct

        import numpy as np

        a = np.asarray(arr, dtype=np.float64)
        if a.ndim == 2:
            a, grayscale = a[:, :, None].repeat(3, axis=2), True
        h, w, _ = a.shape
        if subsampling not in ("444", "420"):
            raise ValueError(f"subsampling must be 444 or 420, got {subsampling}")

        # IJG quality scaling; tables kept in NATURAL order for the
        # math, emitted in zigzag order in the DQT payload (per spec)
        q = max(1, min(100, quality))
        scale = 5000 // q if q < 50 else 200 - 2 * q
        def scaled(base):
            t = (np.array(base, dtype=np.int64) * scale + 50) // 100
            return np.clip(t, 1, 255).astype(np.int32)
        qly_nat, qlc_nat = scaled(ql), scaled(qc)
        zz_idx = np.array(zigzag)
        qly_payload = qly_nat[zz_idx]
        qlc_payload = qlc_nat[zz_idx]

        # forward DCT matrix (orthonormal DCT-II): X = M.T @ x @ M
        k = np.arange(8)
        basis = np.cos((2 * k[:, None] + 1) * k[None, :] * np.pi / 16)
        alpha = np.full(8, np.sqrt(2.0 / 8.0))
        alpha[0] = np.sqrt(1.0 / 8.0)
        m = basis * alpha[None, :]

        # RGB → YCbCr
        r, g, b = a[:, :, 0], a[:, :, 1], a[:, :, 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0

        def enc_table(bits, vals):
            codes = {}
            code = 0
            i = 0
            for ln in range(1, 17):
                for _ in range(bits[ln - 1]):
                    codes[vals[i]] = (ln, code)
                    code += 1
                    i += 1
                code <<= 1
            return codes

        enc = {kk: enc_table(*vv) for kk, vv in tables.items()}

        out = bytearray()
        bitbuf = 0
        nbits = 0

        def put(ln, code):
            nonlocal bitbuf, nbits
            bitbuf = (bitbuf << ln) | code
            nbits += ln
            while nbits >= 8:
                nbits -= 8
                byte = (bitbuf >> nbits) & 0xFF
                out.append(byte)
                if byte == 0xFF:
                    out.append(0x00)

        def magnitude(v):
            av, s = abs(v), 0
            while av:
                av >>= 1
                s += 1
            return s

        def encode_block(blockf, qtab, dc_codes, ac_codes, pred):
            coeffs = m.T @ (blockf - 128.0) @ m
            # quantize with the table laid out in NATURAL order, then
            # emit in zigzag order (the DQT payload is zigzag per spec)
            nat_q = np.zeros(64)
            nat_q[zigzag] = qtab
            qz = np.round(coeffs.reshape(64) / nat_q).astype(np.int64)
            zz = qz[zigzag]
            diff = int(zz[0]) - pred
            s = magnitude(diff)
            ln, code = dc_codes[s]
            put(ln, code)
            if s:
                d = diff if diff >= 0 else diff + (1 << s) - 1
                put(s, d & ((1 << s) - 1))
            run = 0
            last = 63
            while last > 0 and zz[last] == 0:
                last -= 1
            for i in range(1, last + 1):
                v = int(zz[i])
                if v == 0:
                    run += 1
                    continue
                while run > 15:
                    ln, code = ac_codes[0xF0]
                    put(ln, code)
                    run -= 16
                s = magnitude(v)
                ln, code = ac_codes[(run << 4) | s]
                put(ln, code)
                d = v if v >= 0 else v + (1 << s) - 1
                put(s, d & ((1 << s) - 1))
                run = 0
            if last < 63:
                ln, code = ac_codes[0x00]
                put(ln, code)
            return int(zz[0])

        # component plan: (plane, h_samp, v_samp, quant payload, dc/ac keys)
        def downsample2(p):
            p2 = np.pad(
                p, ((0, p.shape[0] % 2), (0, p.shape[1] % 2)), mode="edge"
            )
            return (
                p2[0::2, 0::2] + p2[0::2, 1::2] + p2[1::2, 0::2] + p2[1::2, 1::2]
            ) / 4.0

        if grayscale:
            plan = [(y, 1, 1, qly_payload, "dc0", "ac0")]
        elif subsampling == "420":
            plan = [
                (y, 2, 2, qly_payload, "dc0", "ac0"),
                (downsample2(cb), 1, 1, qlc_payload, "dc1", "ac1"),
                (downsample2(cr), 1, 1, qlc_payload, "dc1", "ac1"),
            ]
        else:
            plan = [
                (y, 1, 1, qly_payload, "dc0", "ac0"),
                (cb, 1, 1, qlc_payload, "dc1", "ac1"),
                (cr, 1, 1, qlc_payload, "dc1", "ac1"),
            ]
        hmax = max(p[1] for p in plan)
        vmax = max(p[2] for p in plan)
        mcux = -(-w // (8 * hmax))
        mcuy = -(-h // (8 * vmax))

        # pad each plane to its full MCU-grid extent by edge replication
        def pad_to(p, rows, cols):
            return np.pad(
                p,
                ((0, rows - p.shape[0]), (0, cols - p.shape[1])),
                mode="edge",
            )

        plan = [
            (pad_to(p, mcuy * cv * 8, mcux * ch * 8), ch, cv, qp, dk, ak)
            for p, ch, cv, qp, dk, ak in plan
        ]

        def flush_bits():
            nonlocal nbits
            if nbits:
                put(8 - nbits, (1 << (8 - nbits)) - 1)  # pad with 1s

        preds = [0] * len(plan)
        n_mcu = 0
        for my in range(mcuy):
            for mx in range(mcux):
                if restart_interval and n_mcu and n_mcu % restart_interval == 0:
                    flush_bits()
                    out += bytes(
                        [0xFF, 0xD0 + ((n_mcu // restart_interval - 1) % 8)]
                    )
                    preds = [0] * len(plan)
                n_mcu += 1
                for ci, (p, ch, cv, qp, dk, ak) in enumerate(plan):
                    for by in range(cv):
                        for bx in range(ch):
                            y0 = (my * cv + by) * 8
                            x0 = (mx * ch + bx) * 8
                            preds[ci] = encode_block(
                                p[y0 : y0 + 8, x0 : x0 + 8],
                                qp,
                                enc[dk],
                                enc[ak],
                                preds[ci],
                            )
        flush_bits()

        def seg(marker, payload):
            return bytes([0xFF, marker]) + struct.pack(">H", len(payload) + 2) + payload

        def dqt(tid, tab):
            return seg(0xDB, bytes([tid]) + bytes(int(x) for x in tab))

        def dht(tc, th, bits, vals):
            return seg(0xC4, bytes([(tc << 4) | th]) + bytes(bits) + bytes(vals))

        sof_body = bytes([8]) + struct.pack(">HH", h, w) + bytes([len(plan)])
        sos_body = bytes([len(plan)])
        for ci, (_, ch, cv, _, dk, ak) in enumerate(plan):
            tq = 0 if dk == "dc0" else 1
            sof_body += bytes([ci + 1, (ch << 4) | cv, tq])
            sos_body += bytes([ci + 1, (tq << 4) | tq])
        sos_body += bytes([0, 63, 0])

        header = b"\xff\xd8" + dqt(0, qly_payload)
        if not grayscale:
            header += dqt(1, qlc_payload)
        header += seg(0xC0, sof_body)
        header += dht(0, 0, *tables["dc0"]) + dht(1, 0, *tables["ac0"])
        if not grayscale:
            header += dht(0, 1, *tables["dc1"]) + dht(1, 1, *tables["ac1"])
        if restart_interval:
            header += seg(0xDD, struct.pack(">H", restart_interval))
        return header + seg(0xDA, sos_body) + bytes(out) + b"\xff\xd9"

    return encode_jpeg


#: by-value-picklable codec closures.
decode_jpeg = build_jpeg_decoder()
encode_jpeg = build_jpeg_encoder()
