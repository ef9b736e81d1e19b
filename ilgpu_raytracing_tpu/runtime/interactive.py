"""Interactive loop: fly-camera session over the renderer.

The reference couples rendering to an OpenTK GL window (RTWindow.cs);
TPU hosts are headless, so the loop takes an input-provider callback
(scripted replay, network stream, or a real window's event pump) and an
optional presenter. A tkinter presenter is provided when a display exists;
otherwise frames can be written to disk or simply displayed nowhere while
the HUD reports timings (the reference's title-bar HUD,
RTWindow.cs:171-188).
"""

from __future__ import annotations

import time
from typing import Callable, Optional

import numpy as np

from ilgpu_raytracing_tpu.runtime.controller import FlyCameraController, InputState
from ilgpu_raytracing_tpu.runtime.renderer import Renderer


class InteractiveSession:
    def __init__(
        self,
        renderer: Renderer,
        input_provider: Callable[[int], Optional[InputState]],
        presenter: Optional[Callable[[np.ndarray, str], None]] = None,
        controller: FlyCameraController | None = None,
    ):
        """input_provider(frame) -> InputState or None to stop.
        presenter(rgb_uint8, hud_text) presents a frame (may be None)."""
        self.r = renderer
        self.input_provider = input_provider
        self.presenter = presenter
        self.controller = controller or FlyCameraController()

    def run(self, max_frames: int = 0) -> int:
        """Pump input -> camera -> render -> present until the provider
        returns None (or max_frames). Returns frames rendered."""
        frames = 0
        last = time.monotonic()
        while max_frames <= 0 or frames < max_frames:
            inp = self.input_provider(frames)
            if inp is None:
                break
            now = time.monotonic()
            dt = max(1e-4, now - last)
            last = now
            cam = self.controller.update(
                self.r.camera, inp, dt, self.r.out_w / max(1, self.r.out_h)
            )
            self.r.set_camera(cam)
            self.r.render(dt)
            if self.presenter is not None:
                self.presenter(self.r.frame_rgb(), self.r.hud.text)
            frames += 1
        return frames


def scripted_input(script: list[InputState]):
    """Input provider replaying a fixed list (testing / benchmarks)."""

    def provider(frame: int):
        return script[frame] if frame < len(script) else None

    return provider


def make_tk_presenter(width: int, height: int):
    """Live window presenter via tkinter (requires a DISPLAY). Returns
    (presenter, close_fn) or (None, None) when no display is available."""
    try:
        import tkinter as tk

        root = tk.Tk()
    except Exception:
        return None, None
    root.title("tpu path tracer")
    label = tk.Label(root)
    label.pack()
    photo_ref = {}

    def presenter(rgb: np.ndarray, hud: str) -> None:
        import tkinter as tk

        h, w = rgb.shape[:2]
        header = f"P6 {w} {h} 255 ".encode()
        photo = tk.PhotoImage(data=header + rgb.tobytes(), format="PPM")
        photo_ref["img"] = photo  # keep alive
        label.configure(image=photo)
        root.title(f"tpu path tracer — {hud}")
        root.update()

    return presenter, root.destroy
