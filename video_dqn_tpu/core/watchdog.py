"""Stall watchdog for long device-bound loops.

Failure-detection parity gap this closes: a dropped axon tunnel blocks a
device call indefinitely (a real incident froze an eval run 80+ minutes
with zero CPU — see CLAUDE.md and docs/ARCHITECTURE.md). The eval runner
got `--gather-timeout` (eval/batched_runner.py) and the bench got
VDQN_BENCH_WATCHDOG_S (bench.py), but a TRAINING run had no defense: a
hung dispatch/sync never exits, so an orchestrator can never restart it
with `-r`. The reference has no equivalent (its training loop is a plain
CUDA-blocking Python loop, /root/reference/train_q_network.py:126-181);
this is incident-driven hardening the tunneled-TPU runtime needs.

Design follows bench.py's watchdog, not eval's wrapped-gather: training
blocks at MANY points (dispatch enqueue once the in-flight queue fills,
the EMA-loss sync at log boundaries, device_get at checkpoints), so
wrapping one call can't cover them. Instead the loop `beat()`s on every
iteration; a daemon thread fires when no beat lands within the deadline.
On fire it prints an actionable message and `os._exit`s non-zero — a
daemon thread plus os._exit because normal interpreter exit would park
forever joining the very device call that hung. The first deadline is
separate (and generous) to cover the cold remote compile, mirroring the
eval watchdog's first-gather exemption. Exit composes with checkpoints +
`train_q_network.py -r` into crash-safe recovery, the same recipe the
batched-eval `-r` path proved during the real incident.
"""

from __future__ import annotations

import os
import sys
import threading
import time
from typing import Callable, Optional


class StallWatchdog:
    """Fire `on_stall(elapsed_s)` (default: print + os._exit(exit_code))
    when no `beat()` arrives within the deadline. Deadline is
    `first_timeout_s` until the first beat (cold-compile grace), then
    `timeout_s`. `stop()` disarms permanently."""

    def __init__(
        self,
        timeout_s: float,
        label: str = "train",
        first_timeout_s: Optional[float] = None,
        on_stall: Optional[Callable[[float], None]] = None,
        exit_code: int = 3,
    ):
        self.timeout_s = float(timeout_s)
        self.first_timeout_s = (
            float(first_timeout_s) if first_timeout_s is not None
            else self.timeout_s
        )
        self._label = label
        self._on_stall = on_stall
        self._exit_code = exit_code
        self._beaten = False
        self._last = time.monotonic()
        self._stop = threading.Event()
        # poll well inside the smallest deadline so a fire is never late by
        # more than ~20% of it
        self._poll_s = max(0.05, min(self.timeout_s, self.first_timeout_s) / 5.0)
        self._thread = threading.Thread(
            target=self._run, daemon=True, name=f"stall-watchdog-{label}")
        self._thread.start()

    def beat(self) -> None:
        self._last = time.monotonic()
        self._beaten = True

    def stop(self) -> None:
        self._stop.set()

    # internal ---------------------------------------------------------
    def _run(self) -> None:
        while not self._stop.wait(self._poll_s):
            deadline = self.timeout_s if self._beaten else self.first_timeout_s
            elapsed = time.monotonic() - self._last
            if elapsed > deadline:
                # stop() may have landed between the wait() and this check
                # (e.g. run_train returned from a legitimately slow final
                # sync just as the deadline crossed) — never fire after
                # disarm.
                if self._stop.is_set():
                    return
                if self._on_stall is not None:
                    self._on_stall(elapsed)
                    return
                print(
                    f"[{self._label}] stall watchdog: no progress for "
                    f"{elapsed:.0f}s (deadline {deadline:.0f}s) — "
                    "device/tunnel failure suspected. Checkpoints already "
                    "written are on disk; rerun with -r to resume from the "
                    "latest sample<N>.",
                    file=sys.stderr,
                    flush=True,
                )
                os._exit(self._exit_code)
