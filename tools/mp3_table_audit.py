"""Audit the carried ISO B.7 Huffman tables against a REAL MP3 stream.

The strongest offline evidence that Huffman table data is correct is a
bit-exact walk of a real encoder's output: every granule's scalefactor
+ Huffman region must consume EXACTLY part2_3_length bits. A single
wrong code length desynchronizes the walk within a few symbols, so tens
of granules landing exactly on their budgets validates every (code,
length) pair the stream exercises — plus the ESC/linbits positions and
the zero/sign structure of the symbol mapping (sign bits are read per
nonzero value, linbits per 15-valued symbol).

This tool understands MPEG-1 (11172-3) and MPEG-2 LSF (13818-3) side
info and scalefactor sizing, so any single-channel or dual-channel
non-intensity Layer III stream can serve as ground truth. Usage:

    python tools/mp3_table_audit.py <file.mp3> [...]

Exit 0 if every granule whose tables are all carried lands exactly on
its budget; granules selecting uncarried tables are reported and
skipped (they are the documented boundary, not a failure).
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from magictables_spark.operators.media_codecs import (  # noqa: E402
    _Bits,
    _huff_lookup,
    _L3_PAIR_TABLES,
    _L3_QUAD_A,
    _MP3_BITRATE_V1_L3,
)

_MP3_BITRATE_V2_L3 = [0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128,
                     144, 160]
_SR = {3: [44100, 48000, 32000], 2: [22050, 24000, 16000],
       0: [11025, 12000, 8000]}

# ISO 13818-3 Table B.2 long scalefactor band boundaries (LSF)
_LSF_SFB_LONG = {
    22050: [0, 6, 12, 18, 24, 30, 36, 44, 54, 66, 80, 96, 116, 140, 168,
            200, 238, 284, 336, 396, 464, 522, 576],
    24000: [0, 6, 12, 18, 24, 30, 36, 44, 54, 66, 80, 96, 114, 136, 162,
            194, 232, 278, 330, 394, 464, 540, 576],
    16000: [0, 6, 12, 18, 24, 30, 36, 44, 54, 66, 80, 96, 116, 140, 168,
            200, 238, 284, 336, 396, 464, 522, 576],
}
# MPEG-1 long tables (11172-3 Table B.8), for completeness
_V1_SFB_LONG = {
    44100: [0, 4, 8, 12, 16, 20, 24, 30, 36, 44, 52, 62, 74, 90, 110,
            134, 162, 196, 238, 288, 342, 418, 576],
    48000: [0, 4, 8, 12, 16, 20, 24, 30, 36, 42, 50, 60, 72, 88, 106,
            128, 156, 190, 230, 276, 330, 384, 576],
    32000: [0, 4, 8, 12, 16, 20, 24, 30, 36, 44, 54, 66, 82, 102, 126,
            156, 194, 240, 296, 364, 448, 550, 576],
}
_V1_SLEN = [
    (0, 0), (0, 1), (0, 2), (0, 3), (3, 0), (1, 1), (1, 2), (1, 3),
    (2, 1), (2, 2), (2, 3), (3, 1), (3, 2), (3, 3), (4, 2), (4, 3),
]

# LSF nr_of_sfb[blocknumber][blocktypenumber] (13818-3 2.4.3.2)
_LSF_NSFB = {
    0: ((6, 5, 5, 5), (9, 9, 9, 9), (6, 9, 9, 9)),
    1: ((6, 5, 7, 3), (9, 9, 12, 6), (6, 9, 12, 6)),
    2: ((11, 10, 0, 0), (18, 18, 0, 0), (15, 18, 0, 0)),
}


def _skip_id3(data: bytes) -> int:
    if data[:3] == b"ID3" and len(data) > 10:
        size = 0
        for b in data[6:10]:
            size = (size << 7) | (b & 0x7F)
        return 10 + size
    return 0


def _parse_frames(data: bytes):
    pos = _skip_id3(data)
    frames = []
    while pos + 4 <= len(data):
        h = int.from_bytes(data[pos:pos + 4], "big")
        if (h >> 21) != 0x7FF:
            pos += 1
            continue
        ver = (h >> 19) & 3          # 3 = MPEG-1, 2 = MPEG-2, 0 = 2.5
        layer = (h >> 17) & 3        # 1 = Layer III
        if ver not in _SR or layer != 1:
            pos += 1
            continue
        crc = not ((h >> 16) & 1)
        br_idx = (h >> 12) & 0xF
        sr_idx = (h >> 10) & 3
        pad = (h >> 9) & 1
        mode = (h >> 6) & 3
        if br_idx in (0, 15) or sr_idx == 3:
            pos += 1
            continue
        sr = _SR[ver][sr_idx]
        if ver == 3:
            kbps = _MP3_BITRATE_V1_L3[br_idx]
            flen = 144 * kbps * 1000 // sr + pad
        else:
            kbps = _MP3_BITRATE_V2_L3[br_idx]
            flen = 72 * kbps * 1000 // sr + pad
        if pos + flen > len(data):
            break
        nch = 1 if mode == 3 else 2
        side_len = (17 if nch == 1 else 32) if ver == 3 else (
            9 if nch == 1 else 17)
        body = pos + 4 + (2 if crc else 0)
        frames.append({
            "ver": ver, "sr": sr, "nch": nch, "kbps": kbps,
            "side": data[body:body + side_len],
            "main": data[body + side_len:pos + flen],
        })
        pos += flen
    return frames


def _parse_side_v2(bits: _Bits, nch: int):
    si = {"main_data_begin": bits.read(8)}
    bits.read(1 if nch == 1 else 2)
    chs = []
    for _ch in range(nch):
        g = {
            "part2_3_length": bits.read(12),
            "big_values": bits.read(9),
            "global_gain": bits.read(8),
            "scalefac_compress": bits.read(9),
            "window_switching": bits.read(1),
        }
        if g["window_switching"]:
            g["block_type"] = bits.read(2)
            g["mixed_block"] = bits.read(1)
            g["table_select"] = [bits.read(5), bits.read(5), 0]
            g["subblock_gain"] = [bits.read(3) for _ in range(3)]
            g["region0_count"] = 8 if g["block_type"] == 2 else 7
            g["region1_count"] = 20 - g["region0_count"]
        else:
            g["block_type"] = 0
            g["mixed_block"] = 0
            g["table_select"] = [bits.read(5), bits.read(5), bits.read(5)]
            g["region0_count"] = bits.read(4)
            g["region1_count"] = bits.read(3)
        g["scalefac_scale"] = bits.read(1)
        g["count1table_select"] = bits.read(1)
        chs.append(g)
    si["granules"] = [chs]  # one granule per LSF frame
    return si


def _parse_side_v1(bits: _Bits, nch: int):
    si = {"main_data_begin": bits.read(9)}
    bits.read(5 if nch == 1 else 3)
    si["scfsi"] = [[bits.read(1) for _ in range(4)] for _ in range(nch)]
    grs = []
    for _gr in range(2):
        chs = []
        for _ch in range(nch):
            g = {
                "part2_3_length": bits.read(12),
                "big_values": bits.read(9),
                "global_gain": bits.read(8),
                "scalefac_compress": bits.read(4),
                "window_switching": bits.read(1),
            }
            if g["window_switching"]:
                g["block_type"] = bits.read(2)
                g["mixed_block"] = bits.read(1)
                g["table_select"] = [bits.read(5), bits.read(5), 0]
                g["subblock_gain"] = [bits.read(3) for _ in range(3)]
                g["region0_count"] = 8 if g["block_type"] == 2 else 7
                g["region1_count"] = 20 - g["region0_count"]
            else:
                g["block_type"] = 0
                g["mixed_block"] = 0
                g["table_select"] = [bits.read(5), bits.read(5),
                                     bits.read(5)]
                g["region0_count"] = bits.read(4)
                g["region1_count"] = bits.read(3)
            g["preflag"] = bits.read(1)
            g["scalefac_scale"] = bits.read(1)
            g["count1table_select"] = bits.read(1)
            chs.append(g)
        grs.append(chs)
    si["granules"] = grs
    return si


def _part2_bits_v2(g: dict) -> int:
    """LSF scalefactor bit count (non-intensity channel)."""
    sc = g["scalefac_compress"]
    if g["block_type"] == 2:
        btn = 2 if g["mixed_block"] else 1
    else:
        btn = 0
    if sc < 400:
        slen = ((sc >> 4) // 5, (sc >> 4) % 5, (sc & 15) >> 2, sc & 3)
        bn = 0
    elif sc < 500:
        t = sc - 400
        slen = ((t >> 2) // 5, (t >> 2) % 5, t & 3, 0)
        bn = 1
    else:
        t = sc - 500
        slen = (t // 3, t % 3, 0, 0)
        bn = 2
    nsfb = _LSF_NSFB[bn][btn]
    return sum(s * n for s, n in zip(slen, nsfb))


def _part2_bits_v1(g: dict, scfsi, gr: int) -> int:
    slen1, slen2 = _V1_SLEN[g["scalefac_compress"]]
    if g["block_type"] == 2:
        return 6 * 3 * slen1 + 6 * 3 * slen2
    groups = [(6, slen1), (5, slen1), (5, slen2), (5, slen2)]
    bits = 0
    for gi, (n, slen) in enumerate(groups):
        if gr == 1 and scfsi[gi]:
            continue
        bits += n * slen
    return bits


def _audit_huffman(bits: _Bits, g: dict, end_bit: int, sfb_long):
    """Walk big-values pairs + count1 quads; return a status string."""
    bv_end = min(2 * g["big_values"], 576)
    if g["window_switching"]:
        r0_end, r1_end = 36, 576
    else:
        r0_end = sfb_long[min(g["region0_count"] + 1, len(sfb_long) - 1)]
        r1_end = sfb_long[min(
            g["region0_count"] + 1 + g["region1_count"] + 1,
            len(sfb_long) - 1)]
    line = 0
    while line < bv_end:
        region = 0 if line < r0_end else (1 if line < r1_end else 2)
        tsel = g["table_select"][region]
        if tsel == 0:
            line += 2
            continue
        entry = _L3_PAIR_TABLES.get(tsel)
        if entry is None:
            return f"uncarried:t{tsel}"
        table, linbits = entry
        try:
            x, y = _huff_lookup(bits, table, 19)
        except Exception:
            return "invalid-code"
        if x == 15 and linbits:
            x += bits.read(linbits)
        if x:
            bits.read(1)
        if y == 15 and linbits:
            y += bits.read(linbits)
        if y:
            bits.read(1)
        if bits.pos > end_bit:
            return "bigvalue-overrun"
        line += 2
    while bits.pos < end_bit and line + 4 <= 576:
        mark = bits.pos
        try:
            if g["count1table_select"]:
                idx = bits.read(4)
                quad = tuple((15 - idx >> (3 - i)) & 1 for i in range(4))
            else:
                quad = _huff_lookup(bits, _L3_QUAD_A, 6)
        except Exception:
            bits.pos = mark
            break
        for v in quad:
            if v:
                bits.read(1)
        if bits.pos > end_bit:
            bits.pos = mark
            break
        line += 4
    gap = end_bit - bits.pos
    if gap == 0:
        return "exact"
    return f"gap:{gap}"


def audit_file(path: str) -> dict:
    data = open(path, "rb").read()
    frames = _parse_frames(data)
    main = bytearray()
    offsets = []
    sides = []
    for fr in frames:
        offsets.append(len(main))
        main += fr["main"]
        bits = _Bits(fr["side"])
        side = (_parse_side_v1(bits, fr["nch"]) if fr["ver"] == 3
                else _parse_side_v2(bits, fr["nch"]))
        sides.append(side)
    stats = {"frames": len(frames), "exact": 0, "gap": 0, "uncarried": {},
             "invalid": 0, "overrun": 0, "skipped_start": 0,
             "tables_exercised": set(), "granules": 0, "gaps": []}
    for i, (fr, si) in enumerate(zip(frames, sides)):
        start_byte = offsets[i] - si["main_data_begin"]
        if start_byte < 0:
            stats["skipped_start"] += 1
            continue
        bits = _Bits(bytes(main))
        bits.pos = 8 * start_byte
        sfb = (_V1_SFB_LONG if fr["ver"] == 3 else _LSF_SFB_LONG)[fr["sr"]]
        for gr, chs in enumerate(si["granules"]):
            for ch, g in enumerate(chs):
                stats["granules"] += 1
                gr_end = bits.pos + g["part2_3_length"]
                p2 = (_part2_bits_v1(g, si["scfsi"][ch], gr)
                      if fr["ver"] == 3 else _part2_bits_v2(g))
                bits.pos += p2
                if bits.pos > gr_end:
                    stats["invalid"] += 1
                    bits.pos = gr_end
                    continue
                for r in range(3):
                    t = g["table_select"][r]
                    if t and 2 * g["big_values"] > 0:
                        stats["tables_exercised"].add(t)
                status = _audit_huffman(bits, g, gr_end, sfb)
                if status == "exact":
                    stats["exact"] += 1
                elif status.startswith("gap"):
                    stats["gap"] += 1
                    stats["gaps"].append(int(status.split(":")[1]))
                elif status.startswith("uncarried"):
                    t = status.split(":t")[1]
                    stats["uncarried"][t] = stats["uncarried"].get(t, 0) + 1
                elif status == "invalid-code":
                    stats["invalid"] += 1
                else:
                    stats["overrun"] += 1
                bits.pos = gr_end
    return stats


def main(argv):
    rc = 0
    for path in argv:
        st = audit_file(path)
        exercised = sorted(st.pop("tables_exercised"))
        print(f"{path}:")
        print(f"  frames={st['frames']} granules={st['granules']} "
              f"exact={st['exact']} gap={st['gap']} "
              f"invalid={st['invalid']} overrun={st['overrun']} "
              f"reservoir-skipped={st['skipped_start']}")
        print(f"  carried tables exercised: {exercised}")
        if st["uncarried"]:
            print(f"  uncarried tables hit: {st['uncarried']}")
        if st["gaps"]:
            print(f"  gap sizes: {sorted(set(st['gaps']))[:10]}")
        if st["invalid"] or st["overrun"]:
            rc = 1
    return rc


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
