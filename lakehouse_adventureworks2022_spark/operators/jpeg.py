"""JPEG codec in numpy + stdlib — no PIL/libjpeg.

Decoder: sequential baseline (SOF0/1) AND progressive (SOF2, r7 —
spectral selection, successive approximation, EOB runs, correction
bits per T.81 G.2), 8-bit, Huffman entropy coding, grayscale / 4:4:4 /
4:2:0 (and any h,v ≤ 2 sampling), 8- and 16-bit quantization tables,
restart markers, byte stuffing. Scans accumulate into per-component
coefficient arrays; one vectorized dequant + batched-IDCT pass
reconstructs at EOI. Also decodes predictive LOSSLESS JPEG (SOF3, r8 —
T.81 Annex H: all 7 predictors, point transform, mod-2^16 difference
arithmetic, 1×1 sampling — at ANY T.81 precision 2-16 AND with
restart markers since r13) and 12-BIT DCT, both extended
sequential AND progressive (r8 — level shift 2048, uint16 output
0..4095; the progressive encoder twin takes ``precision=12`` and the
tests pin decode(progressive-12) == decode(sequential-12) exactly).
Encoders: 4:4:4/4:2:0 baseline with the Annex K example quant tables
(IJG quality scaling) and Annex K typical Huffman tables, a progressive
encoder twin (libjpeg-like scan script) whose quantized coefficients
are bit-identical to the baseline's — the tests pin
decode(progressive) == decode(baseline) exactly — a lossless encoder
twin whose round-trip the tests pin EXACT for every predictor across
the full 2-16-bit precision range (r13; ≤8-bit keeps the Annex K DC
table byte-identically, wider precisions switch to a flat 17-category
table because their diffs reach SSSS 16), and a 12-bit SOF1 twin (flat
16-category DC table: 12-bit DC diffs exceed Annex K's 11 categories).

Arithmetic coding, differential modes, DCT precisions other than 8/12,
and the one lossless corner without an encoder twin to test against
(subsampled components) raise a named
``NotImplementedError`` — the same honesty contract as the other
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
        huff: dict = {}  # (class, id) -> (length, code) -> value
        frame = None
        progressive = False
        lossless = False
        loss_px: dict = {}  # component id -> (h, w) int32 sample grid
        loss_pt = 0  # point transform Al of the lossless scan
        restart_interval = 0

        def build_huff(bits, vals):
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

        # --- entropy bit reader (stuffing stripped lazily) -------------
        bitpos = 0
        bytepos = 0

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

        def receive(s):
            v = 0
            for _ in range(s):
                v = (v << 1) | read_bit()
            return v

        def receive_extend(s):
            if s == 0:
                return 0
            v = receive(s)
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

        def next_marker():
            # after the last MCU of a scan: flush the partial byte, then
            # find the next true marker (skipping pad bytes / stray RSTs)
            nonlocal bitpos, bytepos
            if bitpos:
                bitpos = 0
                bytepos += 1
            p = bytepos
            while p + 1 < len(data):
                if data[p] == 0xFF and data[p + 1] != 0x00:
                    if 0xD0 <= data[p + 1] <= 0xD7:
                        p += 2
                        continue
                    return p
                p += 1
            raise ValueError("unterminated entropy data (no trailing marker)")

        # --- scan decoding into per-component coefficient arrays -------
        # (zigzag order; filled across one sequential scan or many
        # progressive scans, reconstructed once at the end)
        coefs: dict = {}
        geom: dict = {}

        def alloc_coefs():
            nonlocal geom
            comps = frame["comps"]
            hmax = max(c["h"] for c in comps)
            vmax = max(c["v"] for c in comps)
            mcux = -(-frame["w"] // (8 * hmax))
            mcuy = -(-frame["h"] // (8 * vmax))
            geom = {"hmax": hmax, "vmax": vmax, "mcux": mcux, "mcuy": mcuy}
            for c in comps:
                coefs[c["id"]] = np.zeros(
                    (mcuy * c["v"], mcux * c["h"], 64), dtype=np.int32
                )

        def decode_scan(scan_comps, ss, se, ah, al, start):
            """Decode one entropy-coded scan starting at byte ``start``;
            returns the position of the marker that ends it. Sequential
            scans are the ss==0/se==63/ah==0 interleaved case; the four
            progressive cases (T.81 G.2) dispatch on (ss==0, ah==0)."""
            nonlocal bitpos, bytepos
            bitpos, bytepos = 0, start
            by_id = {c["id"]: c for c in frame["comps"]}
            pred = {cs: 0 for cs, _, _ in scan_comps}
            eobrun = 0

            def dc_first(block, cs, tdc):
                s = decode_sym(huff[(0, tdc)])
                pred[cs] += receive_extend(s)
                block[0] = pred[cs] << al

            def dc_refine(block):
                if read_bit():
                    block[0] |= 1 << al

            def ac_first(block, tac):
                nonlocal eobrun
                if eobrun:
                    eobrun -= 1
                    return
                kk = ss
                while kk <= se:
                    rs = decode_sym(huff[(1, tac)])
                    r, s = rs >> 4, rs & 0xF
                    if s == 0:
                        if r == 15:
                            kk += 16
                            continue
                        eobrun = (1 << r) - 1
                        if r:
                            eobrun += receive(r)
                        return
                    kk += r
                    block[kk] = receive_extend(s) << al
                    kk += 1

            def ac_refine(block, tac):
                # T.81 G.2.2 successive-approximation AC refinement:
                # one new ±(1<<al) per nonzero symbol, correction bits
                # for every already-nonzero coefficient passed over.
                # eobrun counts blocks INCLUDING the one the EOBn symbol
                # lands in — that block still consumes its remaining
                # correction bits below before the run decrements.
                nonlocal eobrun
                p1, m1 = 1 << al, -1 << al
                kk = ss
                if eobrun == 0:
                    while kk <= se:
                        rs = decode_sym(huff[(1, tac)])
                        r, s = rs >> 4, rs & 0xF
                        val = 0
                        if s == 0:
                            if r != 15:
                                eobrun = 1 << r
                                if r:
                                    eobrun += receive(r)
                                break
                        else:
                            val = p1 if read_bit() else m1
                        while kk <= se:
                            if block[kk] != 0:
                                if read_bit() and (block[kk] & p1) == 0:
                                    block[kk] += p1 if block[kk] > 0 else m1
                            else:
                                if r == 0:
                                    break
                                r -= 1
                            kk += 1
                        if val and kk <= se:
                            block[kk] = val
                        kk += 1
                if eobrun:
                    while kk <= se:
                        if block[kk] != 0:
                            if read_bit() and (block[kk] & p1) == 0:
                                block[kk] += p1 if block[kk] > 0 else m1
                        kk += 1
                    eobrun -= 1

            def sequential(block, cs, tdc, tac):
                dc_first(block, cs, tdc)
                kk = 1
                while kk < 64:
                    rs = decode_sym(huff[(1, tac)])
                    r, s = rs >> 4, rs & 0xF
                    if s == 0:
                        if r == 15:
                            kk += 16
                            continue
                        break  # EOB
                    kk += r
                    block[kk] = receive_extend(s)
                    kk += 1

            def on_restart():
                nonlocal eobrun
                sync_restart()
                for cs in pred:
                    pred[cs] = 0
                eobrun = 0

            interleaved = len(scan_comps) > 1
            if interleaved and progressive and ss != 0:
                raise ValueError("progressive AC scans must be single-component")
            n_unit = 0
            if interleaved:
                for my in range(geom["mcuy"]):
                    for mx in range(geom["mcux"]):
                        if (
                            restart_interval
                            and n_unit
                            and n_unit % restart_interval == 0
                        ):
                            on_restart()
                        n_unit += 1
                        for cs, tdc, tac in scan_comps:
                            comp = by_id[cs]
                            arr = coefs[cs]
                            for by in range(comp["v"]):
                                for bx in range(comp["h"]):
                                    block = arr[
                                        my * comp["v"] + by,
                                        mx * comp["h"] + bx,
                                    ]
                                    if not progressive:
                                        sequential(block, cs, tdc, tac)
                                    elif ah == 0:
                                        dc_first(block, cs, tdc)
                                    else:
                                        dc_refine(block)
            else:
                (cs, tdc, tac) = scan_comps[0]
                comp = by_id[cs]
                arr = coefs[cs]
                # non-interleaved: MCU = one block over the component's
                # OWN (unpadded-to-MCU) block grid, T.81 A.2.2
                comp_w = -(-frame["w"] * comp["h"] // geom["hmax"])
                comp_h = -(-frame["h"] * comp["v"] // geom["vmax"])
                bw = -(-comp_w // 8)
                bh = -(-comp_h // 8)
                for byy in range(bh):
                    for bxx in range(bw):
                        if (
                            restart_interval
                            and n_unit
                            and n_unit % restart_interval == 0
                        ):
                            on_restart()
                        n_unit += 1
                        block = arr[byy, bxx]
                        if not progressive:
                            sequential(block, cs, tdc, tac)
                        elif ss == 0:
                            if ah == 0:
                                dc_first(block, cs, tdc)
                            else:
                                dc_refine(block)
                        elif ah == 0:
                            ac_first(block, tac)
                        else:
                            ac_refine(block, tac)
            return next_marker()

        def decode_lossless_scan(scan_comps, pred_sel, pt, start):
            """Predictive lossless scan (T.81 Annex H, SOF3): each
            sample is a Huffman-coded difference (DC-table SSSS
            category + extend bits; SSSS==16 means diff=32768) from a
            neighbor predictor. Edge rules per H.1.2.1: the scan's
            first sample predicts 2^(P-Pt-1), the rest of the first
            line predicts Ra, the first sample of later lines predicts
            Rb. Arithmetic is mod 2^16.

            Restart markers (r13, H.2.4): one MCU = one sample
            position across the scan's components, so every
            ``restart_interval`` positions the bit stream realigns at
            an RSTn and prediction RESETS as at scan start — the
            interval's first sample takes the default and the rest of
            that sample line falls back to the 1-D Ra predictor (the
            libjpeg reading of H.1.2.1's "at the beginning of each
            restart interval"); later lines resume the selected
            predictor against the sample buffer."""
            nonlocal bitpos, bytepos, loss_pt
            if not 1 <= pred_sel <= 7:
                raise ValueError(f"bad lossless predictor {pred_sel}")
            loss_pt = pt
            bitpos, bytepos = 0, start
            h, w = frame["h"], frame["w"]
            default = 1 << (frame["prec"] - pt - 1)
            n_mcu = 0
            sy, sx = 0, 0  # position where the current interval began
            for y in range(h):
                for x in range(w):
                    if (
                        restart_interval
                        and n_mcu
                        and n_mcu % restart_interval == 0
                    ):
                        sync_restart()
                        sy, sx = y, x
                    n_mcu += 1
                    for cs, tdc, _ in scan_comps:
                        s = decode_sym(huff[(0, tdc)])
                        diff = 32768 if s == 16 else receive_extend(s)
                        arr = loss_px[cs]
                        if y == sy and x == sx:
                            px = default
                        elif y == sy:
                            px = int(arr[y, x - 1])
                        elif x == 0:
                            px = int(arr[y - 1, 0])
                        else:
                            ra = int(arr[y, x - 1])
                            rb = int(arr[y - 1, x])
                            rc = int(arr[y - 1, x - 1])
                            if pred_sel == 1:
                                px = ra
                            elif pred_sel == 2:
                                px = rb
                            elif pred_sel == 3:
                                px = rc
                            elif pred_sel == 4:
                                px = ra + rb - rc
                            elif pred_sel == 5:
                                px = ra + ((rb - rc) >> 1)
                            elif pred_sel == 6:
                                px = rb + ((ra - rc) >> 1)
                            else:  # 7
                                px = (ra + rb) >> 1
                        arr[y, x] = (px + diff) & 0xFFFF
            return next_marker()

        # --- marker loop: execute every scan up to EOI ------------------
        pos = 2
        saw_scan = False
        while pos + 1 < len(data):
            if data[pos] != 0xFF:
                raise ValueError(f"marker expected at {pos}")
            # T.81 B.1.1.2: any run of 0xFF fill bytes may precede the
            # marker code — skip fills, take the first non-FF byte
            while pos + 1 < len(data) and data[pos + 1] == 0xFF:
                pos += 1
            if pos + 1 >= len(data):
                raise ValueError("truncated JPEG (fill bytes at end)")
            marker = data[pos + 1]
            pos += 2
            if marker == 0xD8:
                continue
            if marker == 0xD9:
                break
            if pos + 2 > len(data):
                raise ValueError("truncated JPEG (no segment length)")
            (seglen,) = struct.unpack(">H", data[pos : pos + 2])
            seg = data[pos + 2 : pos + seglen]
            if marker == 0xDB:  # DQT
                p = 0
                while p < len(seg):
                    pq, tq = seg[p] >> 4, seg[p] & 0xF
                    p += 1
                    if pq:  # 16-bit table entries, big-endian
                        qt[tq] = np.array(
                            struct.unpack(">64H", seg[p : p + 128]),
                            dtype=np.int32,
                        )
                        p += 128
                    else:
                        qt[tq] = np.array(
                            list(seg[p : p + 64]), dtype=np.int32
                        )
                        p += 64
            elif marker in (0xC0, 0xC1, 0xC2, 0xC3):  # SOF0/1/2 DCT, SOF3 lossless
                if len(seg) < 6 or len(seg) < 6 + seg[5] * 3:
                    raise ValueError("truncated SOF segment")
                prec, h, w, nc = seg[0], *struct.unpack(">HH", seg[1:5]), seg[5]
                lossless = marker == 0xC3
                # DCT processes: 8-bit baseline + 12-bit extended
                # sequential/progressive (r8). Lossless (r13): the full
                # T.81 precision range 2..16 — the mod-2^16 difference
                # arithmetic and the SSSS≤16 category space already
                # cover it, so only the guard/clip/dtype are
                # precision-aware (encoder twin pins every width).
                if lossless:
                    if not 2 <= prec <= 16:
                        raise NotImplementedError(
                            f"{prec}-bit lossless JPEG (T.81 allows 2-16)"
                        )
                elif prec not in (8, 12):
                    raise NotImplementedError(f"{prec}-bit JPEG")
                comps = []
                for c in range(nc):
                    cid, hv, tq = seg[6 + c * 3 : 9 + c * 3]
                    comps.append(
                        {"id": cid, "h": hv >> 4, "v": hv & 0xF, "tq": tq}
                    )
                frame = {"h": h, "w": w, "comps": comps, "prec": prec}
                progressive = marker == 0xC2
                if lossless:
                    if any(c["h"] != 1 or c["v"] != 1 for c in comps):
                        raise NotImplementedError(
                            "lossless JPEG (SOF3) with subsampled components"
                        )
                    for c in comps:
                        loss_px[c["id"]] = np.zeros((h, w), dtype=np.int32)
                else:
                    alloc_coefs()
            elif marker in (0xC5, 0xC6, 0xC7):
                raise NotImplementedError(
                    f"JPEG SOF{marker - 0xC0} (differential)"
                )
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
                if frame is None:
                    raise ValueError("SOS before SOF")
                ns = seg[0]
                scan_comps = []
                for c in range(ns):
                    cs, tsel = seg[1 + c * 2 : 3 + c * 2]
                    scan_comps.append((cs, tsel >> 4, tsel & 0xF))
                ss, se, a = seg[1 + ns * 2 : 4 + ns * 2]
                if lossless:
                    pos = decode_lossless_scan(
                        scan_comps, ss, a & 0xF, pos + seglen
                    )
                else:
                    pos = decode_scan(
                        scan_comps, ss, se, a >> 4, a & 0xF, pos + seglen
                    )
                saw_scan = True
                continue
            # APPn/COM/DNL/etc.: skip
            pos += seglen
        if frame is None or not saw_scan:
            raise ValueError("JPEG missing SOF/SOS")

        if lossless:
            # predictive samples ARE the pixels (<< point transform);
            # no IDCT, no color transform — 3-component lossless is
            # stored as RGB by this module's encoder twin (T.81 defines
            # no colorspace for the lossless process). Clip range and
            # output dtype follow the sample precision (r13: full 2-16
            # range; ≤8 bits stays uint8 so the 8-bit contract is
            # byte-identical, wider returns uint16 like the DCT paths)
            lmaxv = (1 << frame["prec"]) - 1
            ldtype = np.uint8 if frame["prec"] <= 8 else np.uint16
            planes = [
                np.clip(loss_px[c["id"]] << loss_pt, 0, lmaxv).astype(
                    ldtype
                )
                for c in frame["comps"]
            ]
            if len(planes) == 1:
                return np.dstack([planes[0]] * 3)
            if len(planes) != 3:
                raise ValueError(f"{len(planes)}-component lossless JPEG")
            return np.dstack(planes)

        # --- reconstruction: dequant + batched IDCT + assemble ----------
        h, w, comps = frame["h"], frame["w"], frame["comps"]
        hmax, vmax = geom["hmax"], geom["vmax"]
        # level shift / clip range / output dtype follow the sample
        # precision (T.81 A.3.1: shift = 2^(P-1)); 12-bit returns uint16
        # with values 0..4095 — the downstream feature/dHash math is
        # scale-tolerant float
        center = float(1 << (frame["prec"] - 1))
        maxv = (1 << frame["prec"]) - 1
        out_dtype = np.uint8 if frame["prec"] == 8 else np.uint16
        full = []
        for comp in comps:
            arr = coefs[comp["id"]]
            bh, bw = arr.shape[:2]
            deq = arr.reshape(-1, 64).astype(np.float64) * qt[
                comp["tq"]
            ].astype(np.float64)
            nat = np.zeros_like(deq)
            nat[:, zigzag] = deq  # unzigzag into natural order
            blocks = nat.reshape(-1, 8, 8)
            px = (
                np.einsum("ij,njk,lk->nil", idct_m, blocks, idct_m) + center
            )
            plane = (
                px.reshape(bh, bw, 8, 8)
                .transpose(0, 2, 1, 3)
                .reshape(bh * 8, bw * 8)
            )
            ry, rx = vmax // comp["v"], hmax // comp["h"]
            if ry > 1 or rx > 1:
                plane = np.repeat(np.repeat(plane, ry, axis=0), rx, axis=1)
            full.append(plane[:h, :w])
        if len(full) == 1:
            g = np.clip(full[0], 0, maxv).astype(out_dtype)
            return np.dstack([g, g, g])
        y, cb, cr = full[0], full[1] - center, full[2] - center
        r = y + 1.402 * cr
        g = y - 0.344136 * cb - 0.714136 * cr
        b = y + 1.772 * cb
        return np.clip(np.dstack([r, g, b]), 0, maxv).astype(out_dtype)

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


def build_progressive_encoder():
    """Factory returning a progressive (SOF2) encoder as a by-value
    closure — the encode-side twin that makes the progressive decode
    path testable without libjpeg (same role as mux_mjpeg for MP4).

    Scan script mirrors the libjpeg default: an interleaved DC-first
    scan at Al=1, per-component AC-first scans with spectral selection
    (luma split 1-5 / 6-63), then successive-approximation refinement
    scans (AC Ah=2→Al=1 where used, DC Ah=1→Al=0, AC Ah=1→Al=0). Uses
    ONE flat 256-symbol Huffman table (128 len-8 + 128 len-9 canonical
    codes) for every class/id so EOBn run symbols (0x10, 0x20, …) —
    which the Annex K tables lack — are codable; EOB runs batch across
    blocks exactly as T.81 G.1.2.2 allows. Quantized coefficients are
    IDENTICAL to the baseline encoder's at the same quality, so
    ``decode(progressive(img)) == decode(baseline(img))`` exactly — the
    cross-check the tests pin."""
    zigzag = list(ZIGZAG)
    ql, qc = list(QUANT_LUMA), list(QUANT_CHROMA)

    def encode_jpeg_progressive(
        arr,
        quality: int = 85,
        subsampling: str = "444",
        grayscale: bool = False,
        precision: int = 8,
    ) -> bytes:
        import struct

        import numpy as np

        if precision not in (8, 12):
            raise ValueError(f"precision must be 8 or 12, got {precision}")
        center = float(1 << (precision - 1))
        a = np.asarray(arr, dtype=np.float64)
        if a.ndim == 2:
            a, grayscale = a[:, :, None].repeat(3, axis=2), True
        if a.max() > (1 << precision) - 1 or a.min() < 0:
            raise ValueError(
                f"{precision}-bit samples must be in 0..{(1 << precision) - 1}"
            )
        h, w, _ = a.shape
        if subsampling not in ("444", "420"):
            raise ValueError(f"subsampling must be 444 or 420, got {subsampling}")

        q = max(1, min(100, quality))
        scale = 5000 // q if q < 50 else 200 - 2 * q

        def scaled(base):
            t = (np.array(base, dtype=np.int64) * scale + 50) // 100
            return np.clip(t, 1, 255).astype(np.int32)

        qly_nat, qlc_nat = scaled(ql), scaled(qc)
        zz_idx = np.array(zigzag)

        k = np.arange(8)
        basis = np.cos((2 * k[:, None] + 1) * k[None, :] * np.pi / 16)
        alpha = np.full(8, np.sqrt(2.0 / 8.0))
        alpha[0] = np.sqrt(1.0 / 8.0)
        m = basis * alpha[None, :]

        r_, g_, b_ = a[:, :, 0], a[:, :, 1], a[:, :, 2]
        y = 0.299 * r_ + 0.587 * g_ + 0.114 * b_
        cb = -0.168736 * r_ - 0.331264 * g_ + 0.5 * b_ + center
        cr = 0.5 * r_ - 0.418688 * g_ - 0.081312 * b_ + center

        def downsample2(p):
            p2 = np.pad(
                p, ((0, p.shape[0] % 2), (0, p.shape[1] % 2)), mode="edge"
            )
            return (
                p2[0::2, 0::2] + p2[0::2, 1::2] + p2[1::2, 0::2] + p2[1::2, 1::2]
            ) / 4.0

        if grayscale:
            plan = [(y, 1, 1, qly_nat, 0)]
        elif subsampling == "420":
            plan = [
                (y, 2, 2, qly_nat, 0),
                (downsample2(cb), 1, 1, qlc_nat, 1),
                (downsample2(cr), 1, 1, qlc_nat, 1),
            ]
        else:
            plan = [
                (y, 1, 1, qly_nat, 0),
                (cb, 1, 1, qlc_nat, 1),
                (cr, 1, 1, qlc_nat, 1),
            ]
        hmax = max(p[1] for p in plan)
        vmax = max(p[2] for p in plan)
        mcux = -(-w // (8 * hmax))
        mcuy = -(-h // (8 * vmax))

        # quantized zigzag coefficients per component, MCU-padded grid.
        # BIT-IDENTICAL math to the baseline encoder (same per-block
        # `m.T @ (block-128) @ m` expression, same np.round): a batched
        # einsum changes float summation order and flips coefficients
        # sitting exactly on a .5 rounding boundary, breaking the
        # decode(progressive) == decode(baseline) exact-equality test
        comp_coefs = []
        for p, ch, cv, qnat, _tq in plan:
            rows, cols = mcuy * cv * 8, mcux * ch * 8
            p = np.pad(
                p,
                ((0, rows - p.shape[0]), (0, cols - p.shape[1])),
                mode="edge",
            )
            bh, bw = rows // 8, cols // 8
            nat_q = qnat.reshape(8, 8).astype(np.float64)
            qz = np.zeros((bh, bw, 64), dtype=np.int64)
            for byy in range(bh):
                for bxx in range(bw):
                    blockf = p[byy * 8 : byy * 8 + 8, bxx * 8 : bxx * 8 + 8]
                    co = m.T @ (blockf - center) @ m
                    qz[byy, bxx] = np.round(co / nat_q).reshape(64)
            comp_coefs.append(qz[:, :, zz_idx])

        # flat 256-symbol canonical Huffman table (len 8 ×128 + len 9 ×128)
        flat_bits = [0] * 7 + [128, 128] + [0] * 7
        flat_vals = list(range(256))
        codes = {}
        code = 0
        i = 0
        for ln in range(1, 17):
            for _ in range(flat_bits[ln - 1]):
                codes[flat_vals[i]] = (ln, code)
                code += 1
                i += 1
            code <<= 1

        out = bytearray()
        bitbuf = 0
        nbits = 0

        def put(ln, c):
            nonlocal bitbuf, nbits
            bitbuf = (bitbuf << ln) | c
            nbits += ln
            while nbits >= 8:
                nbits -= 8
                byte = (bitbuf >> nbits) & 0xFF
                out.append(byte)
                if byte == 0xFF:
                    out.append(0x00)

        def put_sym(sym):
            ln, c = codes[sym]
            put(ln, c)

        def flush_bits():
            nonlocal nbits, bitbuf
            if nbits:
                put(8 - nbits, (1 << (8 - nbits)) - 1)
            bitbuf = 0

        def magnitude(v):
            av, s = abs(v), 0
            while av:
                av >>= 1
                s += 1
            return s

        # ---- scan emitters (T.81 G.1.2) ----
        def dc_first_scan(scan_plan, al):
            preds = {ci: 0 for ci, _ in scan_plan}
            for my in range(mcuy):
                for mx in range(mcux):
                    for ci, (ch, cv) in scan_plan:
                        for by in range(cv):
                            for bx in range(ch):
                                dc = int(
                                    comp_coefs[ci][my * cv + by, mx * ch + bx, 0]
                                ) >> al
                                diff = dc - preds[ci]
                                preds[ci] = dc
                                s = magnitude(diff)
                                put_sym(s)
                                if s:
                                    d = diff if diff >= 0 else diff + (1 << s) - 1
                                    put(s, d & ((1 << s) - 1))

        def dc_refine_scan(scan_plan, al):
            for my in range(mcuy):
                for mx in range(mcux):
                    for ci, (ch, cv) in scan_plan:
                        for by in range(cv):
                            for bx in range(ch):
                                dc = int(
                                    comp_coefs[ci][my * cv + by, mx * ch + bx, 0]
                                )
                                put(1, (dc >> al) & 1)

        def comp_grid(ci):
            ch, cv = plan[ci][1], plan[ci][2]
            comp_w = -(-w * ch // hmax)
            comp_h = -(-h * cv // vmax)
            return -(-comp_h // 8), -(-comp_w // 8)

        def ac_first_scan(ci, ss, se, al):
            eobrun = 0

            def emit_eobrun():
                nonlocal eobrun
                if eobrun:
                    n = eobrun.bit_length() - 1
                    put_sym(n << 4)
                    if n:
                        put(n, eobrun - (1 << n))
                    eobrun = 0

            bh, bw = comp_grid(ci)
            for byy in range(bh):
                for bxx in range(bw):
                    block = comp_coefs[ci][byy, bxx]
                    run = 0
                    wrote = False
                    for kk in range(ss, se + 1):
                        v = int(block[kk])
                        av = abs(v) >> al  # AC point transform: trunc to 0
                        if av == 0:
                            run += 1
                            continue
                        emit_eobrun()
                        while run > 15:
                            put_sym(0xF0)
                            run -= 16
                        s = magnitude(av)
                        put_sym((run << 4) | s)
                        vv = av if v > 0 else -av
                        d = vv if vv >= 0 else vv + (1 << s) - 1
                        put(s, d & ((1 << s) - 1))
                        run = 0
                        wrote = True
                    if run or not wrote:
                        eobrun += 1
                        if eobrun == 0x7FFF:
                            emit_eobrun()
            emit_eobrun()

        def ac_refine_scan(ci, ss, se, al):
            eobrun = 0
            pending: list[int] = []  # correction bits owed after EOBn

            def emit_eobrun():
                nonlocal eobrun
                if eobrun:
                    n = eobrun.bit_length() - 1
                    put_sym(n << 4)
                    if n:
                        put(n, eobrun - (1 << n))
                    eobrun = 0
                for bit in pending:
                    put(1, bit)
                pending.clear()

            bh, bw = comp_grid(ci)
            for byy in range(bh):
                for bxx in range(bw):
                    block = comp_coefs[ci][byy, bxx]
                    absv = [abs(int(block[kk])) >> al for kk in range(ss, se + 1)]
                    # last index (in-band) that is newly significant
                    eob = -1
                    for idx, av in enumerate(absv):
                        if av == 1:
                            eob = idx
                    run = 0
                    # correction bits owed after the NEXT symbol, each
                    # tagged with how many zero-history coefficients
                    # precede it since that symbol: a ZRL's 16-zero
                    # window only carries the corrections INSIDE it
                    # (the decoder stops reading at the 16th zero)
                    br: list[tuple[int, int]] = []
                    for idx, av in enumerate(absv):
                        if av == 0:
                            run += 1
                            continue
                        if av > 1:  # already significant: correction bit
                            br.append((run, av & 1))
                            continue
                        # newly significant (av == 1)
                        emit_eobrun()
                        while run > 15 and idx <= eob:
                            put_sym(0xF0)
                            for tag, bit in [t for t in br if t[0] < 16]:
                                put(1, bit)
                            br = [(tag - 16, bit) for tag, bit in br if tag >= 16]
                            run -= 16
                        put_sym((run << 4) | 1)
                        put(1, 1 if int(block[ss + idx]) > 0 else 0)
                        for _tag, bit in br:
                            put(1, bit)
                        br = []
                        run = 0
                    if run or br:
                        eobrun += 1
                        pending.extend(bit for _tag, bit in br)
                        if eobrun == 0x7FFF:
                            emit_eobrun()
            emit_eobrun()

        # ---- headers ----
        def seg(marker, payload):
            return (
                bytes([0xFF, marker])
                + struct.pack(">H", len(payload) + 2)
                + payload
            )

        header = bytearray(b"\xff\xd8")
        header += seg(0xDB, bytes([0]) + bytes(int(x) for x in qly_nat[zz_idx]))
        if not grayscale:
            header += seg(
                0xDB, bytes([1]) + bytes(int(x) for x in qlc_nat[zz_idx])
            )
        sof = bytes([precision]) + struct.pack(">HH", h, w) + bytes([len(plan)])
        for ci, (_, ch, cv, _, tq) in enumerate(plan):
            sof += bytes([ci + 1, (ch << 4) | cv, tq])
        header += seg(0xC2, sof)
        for tc in (0, 1):
            for th in (0, 1) if not grayscale else (0,):
                header += seg(
                    0xC4,
                    bytes([(tc << 4) | th])
                    + bytes(flat_bits)
                    + bytes(flat_vals),
                )

        def sos(comp_ids, ss, se, ah, al):
            body = bytes([len(comp_ids)])
            for cid in comp_ids:
                body += bytes([cid, 0])  # table 0 for both classes
            body += bytes([ss, se, (ah << 4) | al])
            return seg(0xDA, body)

        result = bytearray(header)

        def run_scan(emit, comp_ids, ss, se, ah, al):
            nonlocal out
            out = bytearray()
            emit()
            flush_bits()
            result.extend(sos(comp_ids, ss, se, ah, al) + out)

        all_ids = [ci + 1 for ci in range(len(plan))]
        scan_plan = [(ci, (plan[ci][1], plan[ci][2])) for ci in range(len(plan))]
        # the libjpeg-like script
        run_scan(lambda: dc_first_scan(scan_plan, 1), all_ids, 0, 0, 0, 1)
        if grayscale:
            run_scan(lambda: ac_first_scan(0, 1, 63, 1), [1], 1, 63, 0, 1)
            run_scan(lambda: dc_refine_scan(scan_plan, 0), all_ids, 0, 0, 1, 0)
            run_scan(lambda: ac_refine_scan(0, 1, 63, 0), [1], 1, 63, 1, 0)
        else:
            run_scan(lambda: ac_first_scan(0, 1, 5, 2), [1], 1, 5, 0, 2)
            run_scan(lambda: ac_first_scan(1, 1, 63, 1), [2], 1, 63, 0, 1)
            run_scan(lambda: ac_first_scan(2, 1, 63, 1), [3], 1, 63, 0, 1)
            run_scan(lambda: ac_first_scan(0, 6, 63, 2), [1], 6, 63, 0, 2)
            run_scan(lambda: ac_refine_scan(0, 1, 63, 1), [1], 1, 63, 2, 1)
            run_scan(lambda: dc_refine_scan(scan_plan, 0), all_ids, 0, 0, 1, 0)
            run_scan(lambda: ac_refine_scan(0, 1, 63, 0), [1], 1, 63, 1, 0)
            run_scan(lambda: ac_refine_scan(1, 1, 63, 0), [2], 1, 63, 1, 0)
            run_scan(lambda: ac_refine_scan(2, 1, 63, 0), [3], 1, 63, 1, 0)
        result += b"\xff\xd9"
        return bytes(result)

    return encode_jpeg_progressive


#: by-value-picklable codec closures.
def build_extended_encoder():
    """Factory returning a 12-bit extended-sequential (SOF1) encoder as
    a by-value closure — the encode-side twin that makes the 12-bit
    decode path testable without libjpeg (the third twin after the
    progressive and lossless ones; r8, shrinking the stub list again).

    Grayscale or 4:4:4 RGB, level shift 2048 (T.81 A.3.1), YCbCr
    centered at 2048, Annex K quant tables under IJG quality scaling
    emitted as 16-bit DQT entries (low qualities scale past 255), ONE
    flat 16-symbol DC table (SSSS categories 0-15 — 12-bit DC diffs
    exceed the Annex K tables' 11) and the progressive encoder's flat
    256-symbol AC table (every run/size byte codable)."""
    zigzag = list(ZIGZAG)
    ql, qc = list(QUANT_LUMA), list(QUANT_CHROMA)

    def encode_jpeg_12bit(arr, quality: int = 95, grayscale: bool = False) -> bytes:
        import struct

        import numpy as np

        a = np.asarray(arr, dtype=np.float64)
        if a.ndim == 2:
            a, grayscale = a[:, :, None].repeat(3, axis=2), True
        if a.max() > 4095 or a.min() < 0:
            raise ValueError("12-bit samples must be in 0..4095")
        h, w, _ = a.shape

        q = max(1, min(100, quality))
        scale = 5000 // q if q < 50 else 200 - 2 * q

        def scaled(base):
            return [max(1, min(65535, (v * scale + 50) // 100)) for v in base]

        # like the baseline encoder: quality-scale in NATURAL order,
        # hand encode_block (and the DQT payload) the ZIGZAG layout —
        # encode_block's nat_q[zigzag] = qtab unscatters it back
        qly, qlc = scaled(ql), scaled(qc)
        qly = [qly[z] for z in zigzag]
        qlc = [qlc[z] for z in zigzag]

        # flat canonical tables: DC = 15 len-4 + 1 len-5 codes over
        # categories 0-15 (never the all-ones len-4 code); AC = the
        # progressive twin's 128 len-8 + 128 len-9 over all 256 bytes
        dc_bits = [0, 0, 0, 15, 1] + [0] * 11
        dc_vals = list(range(16))
        ac_bits = [0] * 7 + [128, 128] + [0] * 7
        ac_vals = list(range(256))

        def enc_table(bits, vals):
            codes, code, i = {}, 0, 0
            for ln in range(1, 17):
                for _ in range(bits[ln - 1]):
                    codes[vals[i]] = (ln, code)
                    code += 1
                    i += 1
                code <<= 1
            return codes

        dc_codes, ac_codes = enc_table(dc_bits, dc_vals), enc_table(ac_bits, ac_vals)

        k = np.arange(8)
        basis = np.cos((2 * k[:, None] + 1) * k[None, :] * np.pi / 16)
        alpha = np.full(8, np.sqrt(2.0 / 8.0))
        alpha[0] = np.sqrt(1.0 / 8.0)
        m = basis * alpha[None, :]

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

        def encode_block(blockf, qtab, pred):
            coeffs = m.T @ (blockf - 2048.0) @ m
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

        r_, g_, b_ = a[:, :, 0], a[:, :, 1], a[:, :, 2]
        y = 0.299 * r_ + 0.587 * g_ + 0.114 * b_
        cb = -0.168736 * r_ - 0.331264 * g_ + 0.5 * b_ + 2048.0
        cr = 0.5 * r_ - 0.418688 * g_ - 0.081312 * b_ + 2048.0
        plan = (
            [(y, qly, 0)]
            if grayscale
            else [(y, qly, 0), (cb, qlc, 1), (cr, qlc, 1)]
        )
        bh, bw = -(-h // 8), -(-w // 8)

        def pad(p):
            return np.pad(
                p, ((0, bh * 8 - h), (0, bw * 8 - w)), mode="edge"
            )

        plan = [(pad(p), qt_, tq) for p, qt_, tq in plan]
        preds = [0] * len(plan)
        for by in range(bh):
            for bx in range(bw):
                for ci, (p, qt_, _) in enumerate(plan):
                    preds[ci] = encode_block(
                        p[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8],
                        qt_,
                        preds[ci],
                    )
        if nbits:
            put(8 - nbits, (1 << (8 - nbits)) - 1)

        def seg(marker, payload):
            return (
                bytes([0xFF, marker])
                + struct.pack(">H", len(payload) + 2)
                + payload
            )

        def dqt16(tid, tab):  # pq=1: 16-bit big-endian entries
            return seg(
                0xDB,
                bytes([0x10 | tid])
                + b"".join(struct.pack(">H", int(v)) for v in tab),
            )

        def dht(tc, th, bits, vals):
            return seg(0xC4, bytes([(tc << 4) | th]) + bytes(bits) + bytes(vals))

        nc = len(plan)
        sof_body = bytes([12]) + struct.pack(">HH", h, w) + bytes([nc])
        sos_body = bytes([nc])
        for ci, (_, _, tq) in enumerate(plan):
            sof_body += bytes([ci + 1, 0x11, tq])
            sos_body += bytes([ci + 1, 0x00])  # DC 0 / AC 0 for all
        sos_body += bytes([0, 63, 0])
        header = b"\xff\xd8" + dqt16(0, qly)
        if not grayscale:
            header += dqt16(1, qlc)
        header += seg(0xC1, sof_body)
        header += dht(0, 0, dc_bits, dc_vals) + dht(1, 0, ac_bits, ac_vals)
        return header + seg(0xDA, sos_body) + bytes(out) + b"\xff\xd9"

    return encode_jpeg_12bit


def build_lossless_encoder():
    """Factory returning a predictive lossless (SOF3) encoder as a
    by-value closure — the encode-side twin that makes the lossless
    decode path testable without libjpeg (same pattern as the
    progressive encoder twin; finishes the job commit 6224580 half
    started, r7 verdict "what's wrong" #1).

    Any T.81 precision 2-16 (r13; default 8), any predictor 1-7,
    optional point transform, grayscale (1 component) or RGB
    (3 components, 1×1 sampling, NO color transform — T.81 defines no
    colorspace for the lossless process; the decoder mirrors this).
    Differences are coded with the Annex K DC luminance Huffman table
    at ≤8 bits (byte-identical to the r8 encoder) and a flat
    17-category table above it (wide-precision diffs reach SSSS 16 —
    past both Annex K tables); SSSS category + extend bits per T.81
    H.1.1/H.1.2, byte stuffing as everywhere else. Exact round-trip
    ``decode(encode(img)) == img`` is pinned in tests/test_jpeg.py for
    every predictor and a sweep of precisions."""
    tables = {"dc0": (list(DC_LUMA_BITS), list(DC_LUMA_VALS))}
    # flat canonical table for SSSS 0..16: seventeen 5-bit codes
    WIDE_BITS = [0, 0, 0, 0, 17] + [0] * 11
    WIDE_VALS = list(range(17))

    def encode_jpeg_lossless(
        arr,
        predictor: int = 4,
        point_transform: int = 0,
        precision: int = 8,
        restart_interval: int = 0,
    ) -> bytes:
        import struct

        import numpy as np

        if not 1 <= predictor <= 7:
            raise ValueError(f"predictor must be 1..7, got {predictor}")
        if not 0 <= point_transform <= 7:
            raise ValueError(f"point transform must be 0..7, got {point_transform}")
        if not 2 <= precision <= 16:
            raise ValueError(
                f"precision must be 2..16 (T.81), got {precision}"
            )
        if not 0 <= restart_interval <= 0xFFFF:
            raise ValueError(
                f"restart interval must be 0..65535, got {restart_interval}"
            )
        a = np.asarray(arr)
        if a.size and int(np.max(a)) > (1 << precision) - 1:
            raise ValueError(
                f"samples exceed {precision}-bit range 0.."
                f"{(1 << precision) - 1}"
            )
        if a.ndim == 2:
            planes = [a.astype(np.int64)]
        elif a.ndim == 3 and a.shape[2] == 3:
            planes = [a[:, :, c].astype(np.int64) for c in range(3)]
        else:
            raise ValueError(f"expected HxW or HxWx3 array, got {a.shape}")
        h, w = planes[0].shape
        pt = point_transform
        planes = [p >> pt for p in planes]

        # canonical Huffman codes for the DC table: Annex K luma at
        # ≤8-bit precision (keeps the r8 byte stream), flat 17-category
        # above it (wide diffs reach SSSS 16)
        codes = {}
        code = 0
        i = 0
        bits, vals = (
            tables["dc0"] if precision <= 8 else (WIDE_BITS, WIDE_VALS)
        )
        for ln in range(1, 17):
            for _ in range(bits[ln - 1]):
                codes[vals[i]] = (ln, code)
                code += 1
                i += 1
            code <<= 1

        out = bytearray()
        bitbuf = 0
        nbits = 0

        def put(ln, c):
            nonlocal bitbuf, nbits
            bitbuf = (bitbuf << ln) | c
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

        default = 1 << (precision - pt - 1)
        n_mcu = 0
        rst_m = 0
        sy, sx = 0, 0  # position where the current interval began
        for y in range(h):
            for x in range(w):
                if (
                    restart_interval
                    and n_mcu
                    and n_mcu % restart_interval == 0
                ):
                    # flush to a byte boundary (1-padded), emit RSTn
                    # RAW (markers are never byte-stuffed), reset the
                    # prediction state exactly like the decoder
                    if nbits:
                        put(8 - nbits, (1 << (8 - nbits)) - 1)
                    out += bytes([0xFF, 0xD0 + rst_m])
                    rst_m = (rst_m + 1) % 8
                    sy, sx = y, x
                n_mcu += 1
                for p in planes:
                    if y == sy and x == sx:
                        px = default
                    elif y == sy:
                        px = int(p[y, x - 1])
                    elif x == 0:
                        px = int(p[y - 1, 0])
                    else:
                        ra = int(p[y, x - 1])
                        rb = int(p[y - 1, x])
                        rc = int(p[y - 1, x - 1])
                        if predictor == 1:
                            px = ra
                        elif predictor == 2:
                            px = rb
                        elif predictor == 3:
                            px = rc
                        elif predictor == 4:
                            px = ra + rb - rc
                        elif predictor == 5:
                            px = ra + ((rb - rc) >> 1)
                        elif predictor == 6:
                            px = rb + ((ra - rc) >> 1)
                        else:  # 7
                            px = (ra + rb) >> 1
                        # px may exceed 8 bits for predictors 4-6; the
                        # mod-2^16 difference arithmetic absorbs it
                    diff = (int(p[y, x]) - px) & 0xFFFF
                    if diff >= 32768:
                        diff -= 65536  # signed representative
                    if diff == 32768 or diff == -32768:
                        ln, c = codes[16]
                        put(ln, c)  # SSSS=16 carries no extend bits
                        continue
                    s = magnitude(diff)
                    ln, c = codes[s]
                    put(ln, c)
                    if s:
                        d = diff if diff >= 0 else diff + (1 << s) - 1
                        put(s, d & ((1 << s) - 1))
        if nbits:
            put(8 - nbits, (1 << (8 - nbits)) - 1)  # pad with 1s

        def seg(marker, payload):
            return (
                bytes([0xFF, marker])
                + struct.pack(">H", len(payload) + 2)
                + payload
            )

        nc = len(planes)
        sof_body = (
            bytes([precision]) + struct.pack(">HH", h, w) + bytes([nc])
        )
        sos_body = bytes([nc])
        for ci in range(nc):
            sof_body += bytes([ci + 1, 0x11, 0])  # 1x1 sampling, Tq ignored
            sos_body += bytes([ci + 1, 0x00])  # DC table 0, no AC table
        sos_body += bytes([predictor, 0, pt])  # Ss=predictor, Se=0, Al=Pt
        header = (
            b"\xff\xd8"
            + seg(0xC4, bytes([0x00]) + bytes(bits) + bytes(vals))
            + seg(0xC3, sof_body)
        )
        if restart_interval:
            header += seg(0xDD, struct.pack(">H", restart_interval))
        return header + seg(0xDA, sos_body) + bytes(out) + b"\xff\xd9"

    return encode_jpeg_lossless


decode_jpeg = build_jpeg_decoder()
encode_jpeg = build_jpeg_encoder()
encode_jpeg_progressive = build_progressive_encoder()
encode_jpeg_lossless = build_lossless_encoder()
encode_jpeg_12bit = build_extended_encoder()
