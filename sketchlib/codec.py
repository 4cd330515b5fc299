"""Versioned binary codec for sketch state.

Canonical on-wire form (mirrors the reference's serde contract — params
header + raw state array is sufficient to reconstruct, see
/root/reference/src/hyperloglog/serde.rs:14-23 and
hyperloglog/mod.rs:129-144): a fixed magic, a version byte, a flags
byte, a JSON params header (kind, seed, shape parameters), then the
state payload. Merge validates header equality, mirroring the
reference's buildhasher/parameter asserts (countminsketch.rs:271-284).

Payloads compress transparently (zlib level 1) when that actually
shrinks them: per-partition CMS tables / Bloom bitsets are mostly zeros
at typical fill, and at cluster scale the stage-1→stage-2 shuffle is
entirely state rows, so 10-50× smaller blobs directly shrink the only
shuffle in the job. Version-1 blobs (pre-compression) still unpack.
"""

from __future__ import annotations

import json
import struct
import zlib

MAGIC = b"SKL1"
VERSION = 2
_FLAG_ZLIB = 1


class SketchCodecError(ValueError):
    pass


class SketchParamMismatch(ValueError):
    """Raised when merging sketches whose params/seed headers differ."""


def pack(kind: str, params: dict, payload: bytes) -> bytes:
    header = json.dumps(
        {"kind": kind, **params}, sort_keys=True, separators=(",", ":")
    ).encode()
    flags = 0
    if len(payload) >= 256:
        packed = zlib.compress(payload, 1)
        if len(packed) < len(payload) * 0.9:
            payload = packed
            flags |= _FLAG_ZLIB
    return MAGIC + struct.pack("<BBI", VERSION, flags, len(header)) + header + payload


def unpack(data: bytes) -> tuple[str, dict, bytes]:
    if bytes(data[:4]) != MAGIC:
        raise SketchCodecError("bad magic: not a sketchlib state blob")
    try:
        version = data[4]
        if version == 1:
            hlen = struct.unpack_from("<I", data, 5)[0]
            off, flags = 9, 0
        elif version == VERSION:
            flags, hlen = struct.unpack_from("<BI", data, 5)
            off = 10
        else:
            raise SketchCodecError(f"unsupported state version {version}")
    except (struct.error, IndexError) as e:  # truncated fixed header
        raise SketchCodecError(f"truncated state header: {e}") from e
    try:
        header = json.loads(bytes(data[off : off + hlen]).decode())
        kind = header.pop("kind")
    except (ValueError, KeyError, UnicodeDecodeError) as e:
        # truncated/corrupt header — normalize to the codec's typed
        # error so callers need exactly one except clause
        raise SketchCodecError(f"corrupt state header: {e}") from e
    payload = bytes(data[off + hlen :])
    if flags & _FLAG_ZLIB:
        try:
            payload = zlib.decompress(payload)
        except zlib.error as e:  # truncated/corrupt blob → codec error
            raise SketchCodecError(f"corrupt compressed state payload: {e}") from e
    return kind, header, payload


def check_mergeable(kind: str, a_params: dict, b_params: dict) -> None:
    if a_params != b_params:
        raise SketchParamMismatch(
            f"cannot merge {kind} sketches with different params: "
            f"{a_params} != {b_params}"
        )
