"""Interactive pixel window for ``render('human')``.

The reference opens one 1000x800 pyglet window per agent and flips the GL
framebuffer every render call, returning each window's ``isopen``
(/root/reference/gym_multi_car_racing/multi_car_racing.py:529-536,595-597);
the demo loop gates on ``env.render().all()`` (mcr:735).

TPU hosts are headless, so windowing is best-effort: when a display exists
(`$DISPLAY`/`$WAYLAND_DISPLAY`, or ``MCR_FORCE_WINDOW=1`` to force SDL's
default driver), ``render('human')`` shows the per-agent rgb_array views
tiled side by side in ONE SDL window (pygame supports a single window per
process — documented divergence from the reference's N windows) and returns
per-agent ``isopen`` bools like the reference. Headless, it falls back to
returning the frames themselves (the round-1 behavior, which `tui.py` uses
for terminal play).
"""

from __future__ import annotations

import os

import numpy as np


def display_available() -> bool:
    return bool(
        os.environ.get("DISPLAY")
        or os.environ.get("WAYLAND_DISPLAY")
        or os.environ.get("MCR_FORCE_WINDOW")
    )


class HumanViewer:
    """One SDL window tiling the per-agent views; tracks isopen."""

    def __init__(self, caption: str = "MultiCarRacing"):
        self._screen = None
        self._caption = caption
        self.isopen = True

    def _ensure(self, w: int, h: int):
        import pygame

        if self._screen is None:
            pygame.init()
            pygame.display.set_caption(self._caption)
            self._screen = pygame.display.set_mode((w, h))
        return pygame

    def show(self, frames) -> np.ndarray:
        """frames: (N, H, W, 3) uint8. Returns (N,) isopen bools."""
        frames = np.asarray(frames)
        n = frames.shape[0]
        if not self.isopen:
            return np.zeros((n,), dtype=bool)
        tiled = np.concatenate(list(frames), axis=1)  # (H, N*W, 3)
        try:
            pygame = self._ensure(tiled.shape[1], tiled.shape[0])
            # pygame surfaces are (W, H) with x-major layout.
            surf = pygame.surfarray.make_surface(tiled.swapaxes(0, 1))
            self._screen.blit(surf, (0, 0))
            pygame.display.flip()
            for event in pygame.event.get():
                if event.type == pygame.QUIT:
                    self.close()
        except Exception:  # pragma: no cover - driver-dependent
            self.close()
        return np.full((n,), self.isopen, dtype=bool)

    def close(self):
        if self._screen is not None:
            try:
                import pygame

                pygame.display.quit()
                pygame.quit()
            except Exception:  # pragma: no cover
                pass
            self._screen = None
        self.isopen = False
