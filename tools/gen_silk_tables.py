#!/usr/bin/env python3
"""Generate audio_formats_tpu/utils/tables/silk_tables.py.

The SILK static data (probability models, LSF codebooks, pitch/LTP tables,
RFC 6716 §4.2) are pure spec constants.  This tool extracts every
``silk_*`` immutable array from the reference source text, validates the
element count against the declared shape, and emits a Python module — the
same generate-and-verify approach as gen_celt_tables.py, avoiding manual
transcription errors for ~2000 values.
"""

import os
import re

REF = "/root/reference/source/audioformats/dopus.d"

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

OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "audio_formats_tpu", "utils", "tables", "silk_tables.py",
)


def parse_tables(src):
    pat = re.compile(
        r"static immutable ([a-z0-9_]+)((?:\[\d+\])+)\s+(silk_[a-z0-9_]+)\s*=\s*\[",
        re.M,
    )
    tables = {}
    for m in pat.finditer(src):
        dtype, dims_s, name = m.group(1), m.group(2), m.group(3)
        dims = [int(d) for d in re.findall(r"\[(\d+)\]", dims_s)]
        # find matching closing bracket for the initializer
        depth = 1
        i = m.end()
        while depth:
            c = src[i]
            if c == "[":
                depth += 1
            elif c == "]":
                depth -= 1
            i += 1
        body = src[m.end() : i - 1]
        body = re.sub(r"/\*.*?\*/", "", body, flags=re.S)
        body = re.sub(r"//[^\n]*", "", body)
        vals = [int(t) for t in re.findall(r"-?\d+", body)]
        total = 1
        for d in dims:
            total *= d
        # D declares T[inner][outer]: reshape with dims reversed.  Some
        # reference tables over-declare the outer dimension (e.g.
        # silk_model_lsf_s2 is declared [10][32] with 16 initialized rows,
        # and only 16 ever indexed) — shrink to the initialized rows.
        shape = list(reversed(dims))
        if len(vals) != total:
            inner = total // shape[0]
            assert len(vals) % inner == 0 and len(vals) < total, \
                (name, len(vals), total, dims)
            shape[0] = len(vals) // inner

        def build(flat, shp):
            if len(shp) == 1:
                return flat
            n = len(flat) // shp[0]
            return [build(flat[k * n : (k + 1) * n], shp[1:])
                    for k in range(shp[0])]

        tables[name] = build(vals, shape)
    return tables


def main():
    src = _source()
    tables = parse_tables(src)
    expected = [
        "silk_model_stereo_s1", "silk_model_stereo_s2",
        "silk_model_stereo_s3", "silk_model_mid_only",
        "silk_model_frame_type_inactive", "silk_model_frame_type_active",
        "silk_model_gain_highbits", "silk_model_gain_lowbits",
        "silk_model_gain_delta", "silk_model_lsf_s1", "silk_model_lsf_s2",
        "silk_model_lsf_s2_ext", "silk_model_lsf_interpolation_offset",
        "silk_model_pitch_highbits", "silk_model_pitch_lowbits_nb",
        "silk_model_pitch_lowbits_mb", "silk_model_pitch_lowbits_wb",
        "silk_model_pitch_delta", "silk_model_pitch_contour_nb10ms",
        "silk_model_pitch_contour_nb20ms",
        "silk_model_pitch_contour_mbwb10ms",
        "silk_model_pitch_contour_mbwb20ms", "silk_model_ltp_filter",
        "silk_model_ltp_filter0_sel", "silk_model_ltp_filter1_sel",
        "silk_model_ltp_filter2_sel", "silk_model_ltp_scale_index",
        "silk_model_lcg_seed", "silk_model_exc_rate",
        "silk_model_pulse_count", "silk_model_pulse_location",
        "silk_model_excitation_lsb", "silk_model_excitation_sign",
        "silk_stereo_weights", "silk_lsf_s2_model_sel_nbmb",
        "silk_lsf_s2_model_sel_wb", "silk_lsf_pred_weights_nbmb",
        "silk_lsf_pred_weights_wb", "silk_lsf_weight_sel_nbmb",
        "silk_lsf_weight_sel_wb", "silk_lsf_codebook_nbmb",
        "silk_lsf_codebook_wb", "silk_lsf_min_spacing_nbmb",
        "silk_lsf_min_spacing_wb", "silk_lsf_ordering_nbmb",
        "silk_lsf_ordering_wb", "silk_cosine", "silk_pitch_scale",
        "silk_pitch_min_lag", "silk_pitch_max_lag",
        "silk_pitch_offset_nb10ms", "silk_pitch_offset_nb20ms",
        "silk_pitch_offset_mbwb10ms", "silk_pitch_offset_mbwb20ms",
        "silk_ltp_filter0_taps", "silk_ltp_filter1_taps",
        "silk_ltp_filter2_taps", "silk_ltp_scale_factor",
        "silk_shell_blocks", "silk_quant_offset",
        "silk_stereo_interp_len",
    ]
    missing = [n for n in expected if n not in tables]
    assert not missing, missing

    # spot-check a few values against RFC 6716 (independent anchors)
    assert tables["silk_pitch_min_lag"] == [16, 24, 32]
    assert tables["silk_pitch_max_lag"] == [144, 216, 288]
    assert tables["silk_quant_offset"] == [[25, 60], [8, 25]]
    assert tables["silk_cosine"][0] == 4096 and tables["silk_cosine"][64] == 0
    assert tables["silk_cosine"][128] == -4096
    assert tables["silk_ltp_scale_factor"] == [15565, 12288, 8192]
    for name in expected:
        if name.startswith("silk_model_") and name != "silk_model_pulse_location":
            stack = [tables[name]]
            while stack:
                row = stack.pop()
                if isinstance(row[0], list):
                    stack.extend(row)
                else:
                    assert row[0] == 256 and row[-1] == 256, name

    with open(OUT, "w") as f:
        f.write('"""SILK static tables (RFC 6716 section 4.2 spec data).\n\n')
        f.write("Generated by tools/gen_silk_tables.py from the reference\n")
        f.write("table data (dopus.d:3848-4573), shape-validated and\n")
        f.write('spot-checked against the RFC."""\n\n')
        for name in expected:
            py = name[5:].upper()  # strip silk_ prefix
            f.write(f"{py} = {tables[name]!r}\n\n")
    print(f"wrote {OUT} with {len(expected)} tables")


if __name__ == "__main__":
    main()
