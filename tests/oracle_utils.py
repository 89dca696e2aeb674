"""Subprocess wrapper around the reference-built oracle CLI."""

from __future__ import annotations

import subprocess
import tempfile
from pathlib import Path

import numpy as np

from cloudini_tpu.core.types import EncodingInfo


def spec_text(info: EncodingInfo) -> str:
    lines = [
        f"width={info.width}",
        f"height={info.height}",
        f"point_step={info.point_step}",
        f"version={int(info.version)}",
        f"encoding={info.encoding_opt.name}",
        f"compression={info.compression_opt.name}",
    ]
    if info.encoding_config:
        lines.append(f"encoding_config={info.encoding_config}")
    for f in info.fields:
        res = "-" if f.resolution is None else repr(f.resolution)
        lines.append(f"field={f.name}:{f.type.name}:{f.offset}:{res}")
    return "\n".join(lines) + "\n"


class Oracle:
    def __init__(self, binary: str):
        self.binary = binary

    def _run(self, *args) -> str:
        r = subprocess.run([self.binary, *args], capture_output=True, text=True)
        if r.returncode != 0:
            raise RuntimeError(f"oracle_cli failed: {r.stderr.strip()}")
        return r.stdout

    def encode(self, info: EncodingInfo, raw: bytes) -> bytes:
        with tempfile.TemporaryDirectory() as d:
            d = Path(d)
            (d / "spec").write_text(spec_text(info))
            (d / "raw").write_bytes(raw)
            self._run("encode", str(d / "spec"), str(d / "raw"), str(d / "out"))
            return (d / "out").read_bytes()

    def decode(self, stream: bytes) -> bytes:
        with tempfile.TemporaryDirectory() as d:
            d = Path(d)
            (d / "in").write_bytes(stream)
            self._run("decode", str(d / "in"), str(d / "out"))
            return (d / "out").read_bytes()

    def header(self, info: EncodingInfo) -> bytes:
        with tempfile.TemporaryDirectory() as d:
            d = Path(d)
            (d / "spec").write_text(spec_text(info))
            self._run("header", str(d / "spec"), str(d / "out"))
            return (d / "out").read_bytes()

    def bound(self, info: EncodingInfo, points: int, include_header: bool = True) -> int:
        with tempfile.TemporaryDirectory() as d:
            d = Path(d)
            (d / "spec").write_text(spec_text(info))
            out = self._run("bound", str(d / "spec"), str(points),
                            "1" if include_header else "0")
            return int(out.strip())
