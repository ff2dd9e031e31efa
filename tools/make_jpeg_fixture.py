#!/usr/bin/env python3
"""Generate src/test/resources/media/gradient_16x16.jpg.

A minimal baseline-sequential grayscale JPEG encoder written from the
JPEG spec (ITU-T T.81 Annex K tables), so the checked-in fixture comes
from an encoder that shares no code with the JDK's ImageIO — the spec
that loads it proves the decode path parses foreign bytes. Stdlib +
numpy only; run from the repo root to (re)create the fixture.
"""
import numpy as np

# --- Annex K luminance quantization table (quality ~50) ---------------
QT = np.array([
    [16, 11, 10, 16, 24, 40, 51, 61],
    [12, 12, 14, 19, 26, 58, 60, 55],
    [14, 13, 16, 24, 40, 57, 69, 56],
    [14, 17, 22, 29, 51, 87, 80, 62],
    [18, 22, 37, 56, 68, 109, 103, 77],
    [24, 35, 55, 64, 81, 104, 113, 92],
    [49, 64, 78, 87, 103, 121, 120, 101],
    [72, 92, 95, 98, 112, 100, 103, 99]], dtype=np.int32)

ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63]

# --- Annex K Huffman tables (luminance DC / AC) -----------------------
DC_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_VALS = list(range(12))
AC_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_VALS = [
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
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA]


def huff_codes(bits, vals):
    codes, code, k = {}, 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes

DC_CODE = huff_codes(DC_BITS, DC_VALS)
AC_CODE = huff_codes(AC_BITS, AC_VALS)


class BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def put(self, code, length):
        self.acc = (self.acc << length) | code
        self.nbits += length
        while self.nbits >= 8:
            b = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(b)
            if b == 0xFF:  # byte stuffing
                self.out.append(0x00)
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self):
        if self.nbits:
            pad = 8 - self.nbits
            self.put((1 << pad) - 1, pad)


def category(v):
    a, c = abs(v), 0
    while a:
        a >>= 1
        c += 1
    return c


def put_coeff(w, codes, run_cat, v):
    code, length = codes[run_cat]
    w.put(code, length)
    cat = run_cat & 0x0F
    if cat:
        if v < 0:
            v += (1 << cat) - 1
        w.put(v, cat)


def dct2(block):
    n = 8
    f = np.zeros((n, n))
    for u in range(n):
        for v in range(n):
            cu = 1 / np.sqrt(2) if u == 0 else 1.0
            cv = 1 / np.sqrt(2) if v == 0 else 1.0
            s = np.sum(block *
                       np.cos((2 * np.arange(n)[:, None] + 1) * u * np.pi / 16) *
                       np.cos((2 * np.arange(n)[None, :] + 1) * v * np.pi / 16))
            f[u, v] = 0.25 * cu * cv * s
    return f


def encode(pixels):
    h, w = pixels.shape
    out = bytearray()
    out += b"\xFF\xD8"                                   # SOI
    out += b"\xFF\xDB" + (67).to_bytes(2, "big") + b"\x00"
    out += bytes(int(QT.flatten()[z]) for z in ZIGZAG)   # DQT, zigzag order
    out += b"\xFF\xC0" + (11).to_bytes(2, "big") + b"\x08"
    out += h.to_bytes(2, "big") + w.to_bytes(2, "big")
    out += b"\x01\x01\x11\x00"                           # SOF0: 1 comp, q0
    for cls, bits, vals in ((0x00, DC_BITS, DC_VALS), (0x10, AC_BITS, AC_VALS)):
        out += b"\xFF\xC4" + (19 + len(vals)).to_bytes(2, "big")
        out += bytes([cls]) + bytes(bits) + bytes(vals)  # DHT
    out += b"\xFF\xDA" + (8).to_bytes(2, "big") + b"\x01\x01\x00\x00\x3F\x00"

    bw = BitWriter()
    prev_dc = 0
    for by in range(0, h, 8):
        for bx in range(0, w, 8):
            block = pixels[by:by + 8, bx:bx + 8].astype(np.float64) - 128.0
            q = np.round(dct2(block) / QT).astype(np.int32).flatten()
            zz = [int(q[z]) for z in ZIGZAG]
            diff = zz[0] - prev_dc
            prev_dc = zz[0]
            put_coeff(bw, DC_CODE, category(diff), diff)
            run = 0
            last_nz = max((i for i in range(1, 64) if zz[i]), default=0)
            for i in range(1, last_nz + 1):
                if zz[i] == 0:
                    run += 1
                    if run == 16:
                        put_coeff(bw, AC_CODE, 0xF0, 0)  # ZRL
                        run = 0
                else:
                    put_coeff(bw, AC_CODE, (run << 4) | category(zz[i]), zz[i])
                    run = 0
            if last_nz < 63:
                put_coeff(bw, AC_CODE, 0x00, 0)          # EOB
    bw.flush()
    out += bw.out
    out += b"\xFF\xD9"                                   # EOI
    return bytes(out)


def main():
    # 16x16 horizontal gradient, same visual as the PNG fixtures
    px = np.tile(np.linspace(16, 240, 16).astype(np.int32), (16, 1))
    data = encode(px)
    path = "src/test/resources/media/gradient_16x16.jpg"
    with open(path, "wb") as f:
        f.write(data)
    print("wrote %s (%d bytes)" % (path, len(data)))


if __name__ == "__main__":
    main()
