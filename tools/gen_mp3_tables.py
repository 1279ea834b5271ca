#!/usr/bin/env python3
"""Generate canonical MPEG-1/2 Layer III constant tables.

The ISO/IEC 11172-3 spec tables (Huffman code tables B.7, scalefactor bands
B.8, synthesis window D of Table B.3, MPEG-2 scalefactor partitions) are
*format facts*.  This script reconstructs them in canonical form by walking
the packed peek-table representation inside the reference decoder
(/root/reference/source/audioformats/minimp3.d) — simulating every possible
bit pattern and recording (codeword, length, x, y) triples — then verifies
each table is prefix-free and Kraft-complete and emits them as plain arrays
in audio_formats_tpu/utils/tables/mp3_tables.py.

The output representation (flat canonical code lists + numpy LUT builder) is
unrelated to the source's 2-level signed-offset packing; only the underlying
spec data survives.  Run: python tools/gen_mp3_tables.py
"""

import re
import sys
from fractions import Fraction

REF = "/root/reference/source/audioformats/minimp3.d"

def _source():
    """The reference tree when mounted (cross-validation), else the
    checked-in spec-constant declarations (tools/spec_constants.py) so the
    generator runs standalone."""
    import os as _os
    import sys as _sys
    if not _os.environ.get("AF_TOOLS_NO_REF") and _os.path.exists(REF):
        return open(REF).read()
    _sys.path.insert(0, _os.path.dirname(_os.path.abspath(__file__)))
    from spec_constants import SNIPPETS
    return SNIPPETS[_os.path.basename(REF)]

OUT = "audio_formats_tpu/utils/tables/mp3_tables.py"


def extract_array(src: str, name: str):
    """Pull a flat int/float array literal by variable name."""
    m = re.search(
        rf"{re.escape(name)}\s*=\s*\[(.*?)\];", src, re.S
    )
    if not m:
        raise SystemExit(f"table {name} not found")
    body = m.group(1)
    body = re.sub(r"//.*", "", body)
    toks = [t.strip() for t in body.replace("[", " ").replace("]", " ").split(",")]
    vals = []
    for t in toks:
        if not t:
            continue
        t = t.rstrip("f")
        vals.append(float(t) if ("." in t or "e" in t or "E" in t) else int(t))
    return vals


def walk_bigvalue_table(tabs, base):
    """Canonicalize one big-values Huffman table from the packed peek tables.

    Returns list of (code, length, x, y).  Root peek width is 5 bits;
    sub-tables encode (offset, width) in negative entries.
    """
    out = {}

    def rec(prefix, plen, tbl_off, width):
        for idx in range(1 << width):
            leaf = tabs[base + tbl_off + idx]
            code = (prefix << width) | idx
            if leaf < 0:
                rec(code, plen + width, -(leaf >> 3), leaf & 7)
            else:
                used = leaf >> 8
                if used == 0 and leaf == 0:
                    continue  # table 0: no codes
                assert used <= width + (plen - plen), (used, width)
                # codeword is the first `plen + used` bits of (prefix,idx)
                total = plen + used
                cw = code >> (width - used) if used <= width else None
                assert used <= width
                cw = (prefix << used) | (idx >> (width - used))
                # nibble order: the reference emits dst[0] from the LOW
                # nibble, then leaf >>= 4 for dst[1] (minimp3.d:843-848)
                # — x (line 2i) is the low nibble.  Round 5 fix: this was
                # transposed, which swapped every big-values pair on the
                # wire (self-consistent builder+decoder, caught by the
                # libavcodec/libmpg123 oracle anchor).
                x, y = leaf & 0xF, (leaf >> 4) & 0xF
                key = (cw, total)
                if key in out:
                    assert out[key] == (x, y), (key, out[key], (x, y))
                else:
                    out[key] = (x, y)

    rec(0, 0, 0, 5)
    return sorted((cw, ln, x, y) for (cw, ln), (x, y) in out.items())


def walk_count1_table(tab):
    """Canonicalize a count1 table: returns list of (code, length, v) where v
    is the 4-bit (v0,v1,v2,v3) presence mask."""
    out = {}

    def rec(prefix, plen, off, width):
        for idx in range(1 << width):
            leaf = tab[off + idx]
            if not (leaf & 8):
                rec((prefix << width) | idx, plen + width, leaf >> 3, leaf & 3)
            else:
                # leaf&7 is the TOTAL code length from the original position
                # (the decoder re-peeks past the first 4 bits, then shifts
                # the cache once by leaf&7).
                total = leaf & 7
                assert total <= plen + width
                cw = ((prefix << width) | idx) >> (plen + width - total)
                key = (cw, total)
                v = leaf >> 4
                if key in out:
                    assert out[key] == v
                else:
                    out[key] = v

    rec(0, 0, 0, 4)
    return sorted((cw, ln, v) for (cw, ln), v in out.items())


def check_prefix_free(codes):
    """codes: list of (cw, len, ...). Verify Kraft sum == 1 and prefix-free."""
    if not codes:
        return
    kraft = sum(Fraction(1, 1 << ln) for cw, ln, *_ in codes)
    assert kraft == 1, f"Kraft sum {kraft}"
    seen = sorted(((cw << (32 - ln), ln) for cw, ln, *_ in codes))
    for i in range(len(seen) - 1):
        a, al = seen[i]
        b, bl = seen[i + 1]
        assert b >> (32 - al) != a >> (32 - al), "prefix violation"


def main():
    src = _source()
    tabs = [int(v) for v in extract_array(src, "static immutable int16_t[] tabs")]
    tabindex = [int(v) for v in extract_array(src, "static immutable int16_t[2*16] tabindex")]
    linbits = [int(v) for v in extract_array(src, "static immutable uint8_t[] g_linbits")]
    tab32 = [int(v) for v in extract_array(src, "static immutable uint8_t[] tab32")]
    tab33 = [int(v) for v in extract_array(src, "static immutable uint8_t[] tab33")]

    # tabindex has 32 entries (tables 0..31): big-values tables.
    huff = []
    for tbl in range(32):
        codes = walk_bigvalue_table(tabs, tabindex[tbl])
        if codes:
            check_prefix_free(codes)
            # spec tables are over 16x16 (x,y) pairs; count entries
            maxx = max(c[2] for c in codes)
            maxy = max(c[3] for c in codes)
            n = len(codes)
            assert n == (maxx + 1) * (maxy + 1), (tbl, n, maxx, maxy)
        huff.append(codes)
    c1a = walk_count1_table(tab32)
    c1b = walk_count1_table(tab33)
    check_prefix_free(c1a)
    check_prefix_free(c1b)
    assert len(c1a) == 16 and len(c1b) == 16

    scf_long = extract_array(src, "static immutable uint8_t[23][8] g_scf_long")
    scf_short = extract_array(src, "static immutable uint8_t[40][8] g_scf_short")
    scf_mixed = extract_array(src, "static immutable uint8_t[40][8] g_scf_mixed")
    scf_partitions = extract_array(src, "static immutable uint8_t[28][3] g_scf_partitions")
    scfc_decode = extract_array(src, "static immutable uint8_t[16] g_scfc_decode")
    g_mod = extract_array(src, "static immutable uint8_t[6*4] g_mod")
    g_preamp = extract_array(src, "static immutable uint8_t[10] g_preamp")
    g_win = extract_array(src, "static immutable float[] g_win")
    # Layer I/II tables for later milestones
    g_bitalloc = extract_array(src, "static immutable uint8_t[] g_bitalloc_code_tab")

    ints = lambda a: [int(v) for v in a]

    with open(OUT, "w") as f:
        f.write('"""MPEG-1/2/2.5 Layer III constant tables (ISO/IEC 11172-3 '
                "/ 13818-3).\n\nGenerated by tools/gen_mp3_tables.py: spec "
                "data (Huffman code tables B.7,\nscalefactor band tables B.8, "
                "synthesis window Table B.3, MPEG-2\nscalefactor partitions) "
                "reconstructed into canonical (codeword, length,\nx, y) form "
                "and machine-verified prefix-free/Kraft-complete.  Do not "
                "edit\nby hand.\n"
                '"""\n\nimport numpy as np\n\n')
        f.write("# Huffman big-values tables 0..31: list of (code, len, x, y)\n")
        f.write(f"HUFF_TABLES = {huff!r}\n\n")
        f.write("# count1 (quadruple) tables: list of (code, len, v0..v3 mask)\n")
        f.write(f"COUNT1_A = {c1a!r}\n")
        f.write(f"COUNT1_B = {c1b!r}\n\n")
        f.write(f"LINBITS = {ints(linbits)!r}\n\n")
        f.write("# scalefactor band tables, 8 sample-rate indices each\n")
        f.write(f"SCF_LONG = {ints(scf_long)!r}\n")
        f.write(f"SCF_SHORT = {ints(scf_short)!r}\n")
        f.write(f"SCF_MIXED = {ints(scf_mixed)!r}\n\n")
        f.write("# MPEG-2 scalefactor partitions / decode helpers\n")
        f.write(f"SCF_PARTITIONS = {ints(scf_partitions)!r}\n")
        f.write(f"SCFC_DECODE = {ints(scfc_decode)!r}\n")
        f.write(f"SCF_MOD = {ints(g_mod)!r}\n")
        f.write(f"PREAMP = {ints(g_preamp)!r}\n\n")
        f.write("# Layer I/II bit-allocation code table\n")
        f.write(f"BITALLOC_CODE_TAB = {ints(g_bitalloc)!r}\n\n")
        f.write("# polyphase synthesis window (ISO Table B.3 derived form)\n")
        f.write("SYNTH_WIN = np.array(" + repr([float(v) for v in g_win]) +
                ", dtype=np.float32)\n")
    print(f"wrote {OUT}: {sum(len(h) for h in huff)} huffman codes, "
          f"win={len(g_win)}")


if __name__ == "__main__":
    sys.exit(main())
