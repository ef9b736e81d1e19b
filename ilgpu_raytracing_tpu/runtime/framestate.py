"""Cross-frame render state as an explicit pytree.

The reference's persistent GPU state -- reservoir ping-pong SoA buffers
(Framebuffer.cs:25-44, 127-146), TAA history (RTTaa.cs:20-23), and the
previous camera (RTRenderer.cs:236) -- becomes one immutable pytree carried
through the pure frame step. Ping-pong is a host-side swap of pytree leaves
(zero copies); this makes the reference's write-ordering conventions
("write m last", read-prev-only) unrepresentable by construction
(SURVEY.md section 5).

It also gives checkpoint/resume for free: the pytree serializes with
orbax/np.savez (the reference has no checkpointing at all).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np
from flax import struct

from ilgpu_raytracing_tpu.ops.restir import Reservoirs


@struct.dataclass
class FrameState:
    res_prev: Reservoirs  # read-only this frame (low-res N)
    res_cur: Reservoirs  # being overwritten this frame
    taa_color: jnp.ndarray  # (outN,) uint32 packed history
    taa_obj: jnp.ndarray  # (outN,) i32
    taa_valid: jnp.ndarray  # () bool
    accum: jnp.ndarray  # (lowN,3) f32 progressive accumulation
    accum_count: jnp.ndarray  # () i32

    @staticmethod
    def create(low_n: int, out_n: int) -> "FrameState":
        return FrameState(
            res_prev=Reservoirs.empty(low_n),
            res_cur=Reservoirs.empty(low_n),
            taa_color=jnp.zeros((out_n,), jnp.uint32),
            taa_obj=jnp.full((out_n,), -1, jnp.int32),
            taa_valid=jnp.asarray(False),
            accum=jnp.zeros((low_n, 3), jnp.float32),
            accum_count=jnp.asarray(0, jnp.int32),
        )

    def swapped_reservoirs(self) -> "FrameState":
        return self.replace(res_prev=self.res_cur, res_cur=self.res_prev)

    # ---- checkpoint / resume ----

    def save(self, path: str) -> None:
        flat = {
            "res_prev_L": self.res_prev.L, "res_prev_wi": self.res_prev.wi,
            "res_prev_pdf": self.res_prev.pdf, "res_prev_w": self.res_prev.w,
            "res_prev_w_sum": self.res_prev.w_sum, "res_prev_m": self.res_prev.m,
            "res_prev_light_id": self.res_prev.light_id,
            "res_prev_W": self.res_prev.W, "res_cur_W": self.res_cur.W,
            "res_cur_L": self.res_cur.L, "res_cur_wi": self.res_cur.wi,
            "res_cur_pdf": self.res_cur.pdf, "res_cur_w": self.res_cur.w,
            "res_cur_w_sum": self.res_cur.w_sum, "res_cur_m": self.res_cur.m,
            "res_cur_light_id": self.res_cur.light_id,
            "taa_color": self.taa_color, "taa_obj": self.taa_obj,
            "taa_valid": self.taa_valid, "accum": self.accum,
            "accum_count": self.accum_count,
        }
        np.savez(path, **{k: np.asarray(v) for k, v in flat.items()})

    @staticmethod
    def load(path: str) -> "FrameState":
        z = np.load(path)

        def mk(p):
            # snapshots written before the W slot existed load with W = 0,
            # matching Reservoirs.empty semantics (W is re-derived on the
            # next restir pass; old checkpoints stay loadable)
            n = z[p + "_pdf"].shape[0]
            w_cap = (
                z[p + "_W"] if p + "_W" in z.files
                else np.zeros((n,), np.float32)
            )
            return Reservoirs(
                L=jnp.asarray(z[p + "_L"]), wi=jnp.asarray(z[p + "_wi"]),
                pdf=jnp.asarray(z[p + "_pdf"]), w=jnp.asarray(z[p + "_w"]),
                w_sum=jnp.asarray(z[p + "_w_sum"]), m=jnp.asarray(z[p + "_m"]),
                light_id=jnp.asarray(z[p + "_light_id"]),
                W=jnp.asarray(w_cap),
            )
        return FrameState(
            res_prev=mk("res_prev"), res_cur=mk("res_cur"),
            taa_color=jnp.asarray(z["taa_color"]),
            taa_obj=jnp.asarray(z["taa_obj"]),
            taa_valid=jnp.asarray(bool(z["taa_valid"])),
            accum=jnp.asarray(z["accum"]),
            accum_count=jnp.asarray(z["accum_count"]),
        )
