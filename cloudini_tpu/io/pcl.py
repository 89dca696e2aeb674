"""Decode-into-a-different-layout support — the framework's equivalent of the
reference's PCL conversion shell (pcl_conversion.hpp:100-156): remap stream
fields onto a target point layout by NAME, marking fields absent from the
target with the DECODE_BUT_SKIP_STORE sentinel (stream consumed, nothing
stored)."""

from __future__ import annotations

from typing import Sequence, Tuple

import numpy as np

from ..codec.pipeline import PointcloudDecoder
from ..core.header import decode_header
from ..core.types import DECODE_BUT_SKIP_STORE, EncodingInfo, PointField


def remap_decode_layout(
    stream_info: EncodingInfo, target_fields: Sequence[PointField], target_point_step: int
) -> EncodingInfo:
    """Rewrite the stream schema's offsets to match a target layout by field
    name; unknown fields become decode-but-skip (pcl_conversion.hpp:137-156)."""
    by_name = {f.name: f for f in target_fields}
    remapped = []
    for f in stream_info.fields:
        tgt = by_name.get(f.name)
        if tgt is None:
            remapped.append(PointField(f.name, DECODE_BUT_SKIP_STORE, f.type, f.resolution))
            continue
        if tgt.type != f.type:
            raise ValueError(
                f"Field type mismatch for field: {f.name}. "
                f"Expected: {int(tgt.type)}, got: {int(f.type)}"
            )
        remapped.append(PointField(f.name, tgt.offset, f.type, f.resolution))
    return stream_info.with_(fields=tuple(remapped), point_step=target_point_step)


def decode_into_layout(
    stream: bytes, target_fields: Sequence[PointField], target_point_step: int,
    backend: str = "auto",
) -> Tuple[EncodingInfo, np.ndarray]:
    """Decode a cloudini stream into (n, target_point_step) rows laid out per
    ``target_fields``; stream fields missing from the target are skipped."""
    info, header_len = decode_header(stream)
    remapped = remap_decode_layout(info, target_fields, target_point_step)
    rows = PointcloudDecoder(backend=backend).decode(remapped, stream[header_len:])
    return remapped, rows
