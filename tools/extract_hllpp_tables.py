"""One-off provenance tool: materialize the HyperLogLog++ empirical
correction tables into ``sketchlib/_hllpp_data.npz``.

The tables (rawEstimate / bias / threshold, precisions 4..18) are public
data from the appendix of the HLL++ paper:

    Heule, Nunkesser, Hall — "HyperLogLog in Practice: Algorithmic
    Engineering of a State of the Art Cardinality Estimation Algorithm",
    EDBT 2013 (appendix data published by the authors).

The reference library embeds the same public dataset
(/root/reference/src/hyperloglog/data.rs:22-4017); this script parses that
embedding once so the committed ``.npz`` is byte-reproducible. Only the
*data* (public paper appendix) is taken — no code.

Run: python tools/extract_hllpp_tables.py
"""

from __future__ import annotations

import re
from pathlib import Path

import numpy as np

SRC = Path("/root/reference/src/hyperloglog/data.rs")
OUT = Path(__file__).resolve().parent.parent / "sketchlib" / "_hllpp_data.npz"


def _parse_groups(text: str, vec_name: str) -> list[np.ndarray]:
    start = text.index("=", text.index(vec_name))
    depth = 0
    i = text.index("[", start)
    j = i
    while True:
        if text[j] == "[":
            depth += 1
        elif text[j] == "]":
            depth -= 1
            if depth == 0:
                break
        j += 1
    body = text[i + 1 : j]
    groups = []
    for m in re.finditer(r"&\[(.*?)\]", body, re.S):
        nums = [float(x) for x in re.findall(r"[-+0-9.eE]+", m.group(1))]
        groups.append(np.asarray(nums, dtype=np.float64))
    assert len(groups) == 15, len(groups)  # precisions 4..18
    return groups


def main() -> None:
    text = SRC.read_text()
    raw = _parse_groups(text, "RAW_ESTIMATE_DATA_VEC")
    bias = _parse_groups(text, "BIAS_DATA_VEC")
    thr_m = re.search(r"THRESHOLD_DATA_VEC[^\[]*\[(.*?)\];", text, re.S)
    assert thr_m is not None
    thresholds = np.asarray(
        [int(x) for x in re.findall(r"\b(\d+),", thr_m.group(1))], dtype=np.int64
    )
    assert thresholds.shape == (15,), thresholds
    payload: dict[str, np.ndarray] = {"thresholds": thresholds}
    for b, (r, bi) in enumerate(zip(raw, bias), start=4):
        assert r.shape == bi.shape and len(r) >= 6, (b, r.shape, bi.shape)
        payload[f"raw_{b}"] = r
        payload[f"bias_{b}"] = bi
    np.savez_compressed(OUT, **payload)
    print(f"wrote {OUT} ({OUT.stat().st_size} bytes)")


if __name__ == "__main__":
    main()
