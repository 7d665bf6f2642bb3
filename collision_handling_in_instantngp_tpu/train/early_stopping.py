"""Early stopping — host-side state machine, reference utils.py:177-207.

Counter increments on a "stall" (improvement smaller than min_delta) or on
"growth" (loss worse by more than min_delta); any other outcome resets the
counter and records the new best (default should_reset=True path). Stops when
the counter reaches ``tolerance``.
"""

from __future__ import annotations

import math


class EarlyStopping:
    def __init__(
        self, tolerance: int = 5, min_delta: float = 0.0, should_reset: bool = True
    ):
        self.tolerance = tolerance
        self.min_delta = min_delta
        self.best_loss = math.inf
        self.counter = 0
        self.early_stop = False
        self._should_reset = should_reset

    def __call__(self, loss: float) -> None:
        if abs(self.best_loss - loss) < self.min_delta and loss < self.best_loss:
            self.counter += 1          # stall (utils.py:189-191)
        elif abs(self.best_loss - loss) > self.min_delta and loss > self.best_loss:
            self.counter += 1          # growing (utils.py:192-194)
        else:
            if not self._should_reset:
                self.counter = max(self.counter - 1, 0)
            else:
                self.counter = 0
                self.best_loss = loss
        if self.counter >= self.tolerance:
            self.early_stop = True
