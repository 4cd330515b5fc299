"""Versioned binary codec for sketch state.

Canonical on-wire form (mirrors the reference's serde contract — params
header + raw state array is sufficient to reconstruct, see
/root/reference/src/hyperloglog/serde.rs:14-23 and
hyperloglog/mod.rs:129-144): a fixed magic, a version byte, a JSON params
header (kind, seed, shape parameters), then the raw little-endian state
payload. Merge validates header equality, mirroring the reference's
buildhasher/parameter asserts (e.g. countminsketch.rs:271-284).
"""

from __future__ import annotations

import json
import struct

MAGIC = b"SKL1"
VERSION = 1


class SketchCodecError(ValueError):
    pass


class SketchParamMismatch(ValueError):
    """Raised when merging sketches whose params/seed headers differ."""


def pack(kind: str, params: dict, payload: bytes) -> bytes:
    header = json.dumps(
        {"kind": kind, **params}, sort_keys=True, separators=(",", ":")
    ).encode()
    return MAGIC + struct.pack("<BI", VERSION, len(header)) + header + payload


def unpack(data: bytes) -> tuple[str, dict, bytes]:
    if bytes(data[:4]) != MAGIC:
        raise SketchCodecError("bad magic: not a sketchlib state blob")
    version, hlen = struct.unpack_from("<BI", data, 4)
    if version != VERSION:
        raise SketchCodecError(f"unsupported state version {version}")
    header = json.loads(bytes(data[9 : 9 + hlen]).decode())
    kind = header.pop("kind")
    return kind, header, bytes(data[9 + hlen :])


def check_mergeable(kind: str, a_params: dict, b_params: dict) -> None:
    if a_params != b_params:
        raise SketchParamMismatch(
            f"cannot merge {kind} sketches with different params: "
            f"{a_params} != {b_params}"
        )
