"""Input state — Platform/Win32/Input.h analog for the headless engine.

The reference tracks a 256-key keyboard, 3 mouse buttons and the cursor
through the Win32 message pump; components read it via GlobalInput
(EditorComponent camera fly, TestComponent controls). Here events arrive
from whatever frontend drives the engine — the web editor posts them over
HTTP, tests inject them directly — and `end_frame()` derives the
Pressed-this-frame edge state exactly like InputState::TrackForChanges.
"""

from __future__ import annotations

UP, DOWN, PRESSED = 0, 1, 2

# Common key codes (VK_* parity for the ones content uses)
KEY_W, KEY_A, KEY_S, KEY_D = 87, 65, 83, 68
KEY_Q, KEY_E, KEY_U = 81, 69, 85
KEY_SPACE, KEY_SHIFT, KEY_F5, KEY_F6 = 32, 16, 116, 117


class InputState:
    """Keyboard/mouse/cursor snapshot with per-frame edge tracking."""

    def __init__(self):
        self._keys = bytearray(256)
        self._mouse = bytearray(3)
        self.cursor = (0, 0)
        self._prev_keys = bytearray(256)
        self._prev_mouse = bytearray(3)

    # -- event injection (frontend side) -----------------------------------
    def key_down(self, code: int) -> None:
        if 0 <= code < 256:
            self._keys[code] = DOWN

    def key_up(self, code: int) -> None:
        if 0 <= code < 256:
            self._keys[code] = UP

    def button_down(self, b: int) -> None:
        if 0 <= b < 3:
            self._mouse[b] = DOWN

    def button_up(self, b: int) -> None:
        if 0 <= b < 3:
            self._mouse[b] = UP

    def move_cursor(self, x: int, y: int) -> None:
        self.cursor = (int(x), int(y))

    # -- queries (component side; InputState::IsKey* parity) ---------------
    def is_key_down(self, code: int) -> bool:
        return self._keys[code] != UP

    def is_key_pressed(self, code: int) -> bool:
        """Down THIS frame (edge) — IsKeyPressed parity."""
        return self._keys[code] != UP and self._prev_keys[code] == UP

    def is_button_down(self, b: int) -> bool:
        return self._mouse[b] != UP

    def is_button_click(self, b: int) -> bool:
        return self._mouse[b] != UP and self._prev_mouse[b] == UP

    def cursor_delta(self) -> tuple[int, int]:
        px, py = getattr(self, "_prev_cursor", self.cursor)
        return self.cursor[0] - px, self.cursor[1] - py

    # -- frame boundary (TrackForChanges parity) ---------------------------
    def end_frame(self) -> None:
        self._prev_keys = bytearray(self._keys)
        self._prev_mouse = bytearray(self._mouse)
        self._prev_cursor = self.cursor
