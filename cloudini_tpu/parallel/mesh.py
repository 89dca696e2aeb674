"""SPMD scaling: data-parallel chunk sharding over a jax.sharding.Mesh.

The reference's only parallelism is one worker thread overlapping stage-2 with
stage-1 (cloudini.cpp:453-499). Here scaling is first-class: chunks (the unit of
predictor independence, codec_common.hpp:28) are sharded across devices on a
1-D ``data`` mesh axis; schema/committed-V5-modes are replicated (broadcast);
compressed frames return in original order because the chunk axis IS the order
(ordered gather = device_get of the sharded array).

Multi-host: the same code runs under jax.distributed with a global mesh — XLA
inserts the DCN collectives. (No explicit collectives are needed for the
data-parallel encode itself; only the host-side bag writer consumes the ordered
gather.)
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core.plan import CodecPlan
from ..ops.device_codec import DeviceStage1Decoder, DeviceStage1Encoder


def make_mesh(n_devices: Optional[int] = None, axis: str = "data") -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis,))


class ShardedChunkCodec:
    """Chunk-data-parallel encode/decode over a mesh.

    Arrays: rows (C, N, step) uint8 sharded on C; payloads (C, maxB) uint8
    sharded on C; sizes (C,) sharded on C. C must be a multiple of the mesh
    size (callers pad with empty chunks, n_valid=0).
    """

    def __init__(self, plan: CodecPlan, point_step: int, mesh: Mesh,
                 chunk_points: int = 32 * 1024, axis: str = "data",
                 stage2: str = "none", adaptive_modes: Optional[dict] = None):
        self.mesh = mesh
        self.axis = axis
        self.adaptive_modes = dict(adaptive_modes) if adaptive_modes else None
        self.encoder = DeviceStage1Encoder(plan, point_step, chunk_points,
                                           stage2=stage2,
                                           adaptive_modes=adaptive_modes)
        self.chunk_points = chunk_points
        self.point_step = point_step
        self._dec: Optional[DeviceStage1Decoder] = None
        self.plan = plan
        # RETRY telemetry (VERDICT r4 item 9): decode_exact counts chunks it
        # escaped to the host so the FSM-speculation cliff is observable
        self.device_chunks = 0
        self.retry_chunks = 0

        shard = NamedSharding(mesh, P(axis))
        self._enc_jit = jax.jit(
            self.encoder._encode,
            in_shardings=(NamedSharding(mesh, P(axis, None, None)), shard),
            out_shardings=(NamedSharding(mesh, P(axis, None)), shard),
        )

    def _decoder(self, max_bytes: int) -> DeviceStage1Decoder:
        if self._dec is None or self._dec.max_bytes != max_bytes:
            dec = DeviceStage1Decoder(self.plan, self.point_step, self.chunk_points, max_bytes,
                                      with_sections=self.adaptive_modes is not None)
            shard = NamedSharding(self.mesh, P(self.axis))
            # re-jit with shardings, honoring the decoder's own path dispatch
            # (mixed fixed/varint and Gorilla plans use the FSM decoder;
            # all-fixed plans the arithmetic walk; pure-varint the scan+sort;
            # V5 plans decode their adaptive sections in the same program)
            if dec.with_sections:
                body = dec._decode_with_sections
            elif dec.fsm:
                body = dec._fsm_dec.decode
            elif dec.general:
                body = dec._decode_general
            else:
                body = dec._decode
            dec._fn = jax.jit(
                body,
                in_shardings=(NamedSharding(self.mesh, P(self.axis, None)), shard, shard),
                out_shardings=(NamedSharding(self.mesh, P(self.axis, None, None)), shard),
            )
            self._dec = dec
        return self._dec

    def pad_chunk_count(self, c: int) -> int:
        d = self.mesh.devices.size
        return ((c + d - 1) // d) * d

    def encode(self, rows, n_valid) -> Tuple[jax.Array, jax.Array]:
        """rows (C, N, step), n_valid (C,) -> (payloads (C, maxB), sizes (C,)).
        Results stay on device; the ordered gather happens when the host
        consumes them (np.asarray preserves the chunk order)."""
        return self._enc_jit(rows, n_valid)

    def decode(self, payloads, sizes, n_valid) -> jax.Array:
        return self._decoder(payloads.shape[1]).decode_chunks(payloads, sizes, n_valid)

    def decode_exact(self, payloads, sizes, n_valid) -> np.ndarray:
        """decode + the host-RETRY escape (same contract as the single-chip
        pipeline, pipeline.py:627): chunks the device tier flags RETRY —
        mis-speculated Gorilla window, 9+-byte tokens, per-chunk V5 wire-mode
        divergence — are re-decoded host-side, so the result is exact for
        every legal stream. Returns host rows (C, N, step)."""
        out, consumed = self.decode(payloads, sizes, n_valid)
        out_h = np.array(np.asarray(out))  # writable ordered gather
        cons = np.asarray(consumed)
        from ..ops.adaptive_decode import RETRY

        bad = np.nonzero((cons == RETRY) & (np.asarray(n_valid) > 0))[0]
        self.device_chunks += int((np.asarray(n_valid) > 0).sum())
        self.retry_chunks += len(bad)
        if len(bad):
            from .. import native
            from ..ref import stage1 as np_stage1
            from ..ref import v5 as np_v5

            pay_h = np.asarray(payloads)
            sz = np.asarray(sizes)
            nv = np.asarray(n_valid)
            for i in bad:
                data = pay_h[i, : sz[i]]
                rows = out_h[i, : nv[i]]
                if native.available() and self.plan.units and len(self.plan.units) <= 64:
                    pos = native.decode_chunk(self.plan, data, rows, int(nv[i]))
                else:
                    pos = np_stage1.decode_chunk(self.plan, data, rows, int(nv[i]))
                if self.adaptive_modes is not None:  # wire carries sections
                    for field in self.plan.adaptive:
                        pos = np_v5.decode_section(field, data, pos, rows, int(nv[i]))
        return out_h


def shard_rows(rows: np.ndarray, chunk_points: int, mesh: Mesh, axis: str = "data"):
    """Host rows (n, step) -> (device-sharded (C, N, step), n_valid (C,)).
    Pads the ragged tail chunk and rounds C up to the mesh size."""
    n, step = rows.shape
    c = max(1, -(-n // chunk_points))
    d = mesh.devices.size
    c_pad = ((c + d - 1) // d) * d
    out = np.zeros((c_pad, chunk_points, step), dtype=np.uint8)
    n_valid = np.zeros(c_pad, dtype=np.int32)
    for i in range(c):
        part = rows[i * chunk_points : (i + 1) * chunk_points]
        out[i, : len(part)] = part
        n_valid[i] = len(part)
    sharding = NamedSharding(mesh, P(axis, None, None))
    return (
        jax.device_put(out, sharding),
        jax.device_put(n_valid, NamedSharding(mesh, P(axis))),
    )
