"""Failure detection and elastic recovery around the sprint loop.

The reference had neither (SURVEY §5): ``HANDLE_ERROR`` aborted the
process on any CUDA API error (cuda_sim.cu:407) and the PBS job walltime
was the only watchdog (GPU_Test.sub:4) — a 14-minute run died with it.
Counter-based RNG makes a real recovery story cheap here, because a
rebuilt runner resumed from a checkpoint continues the *identical*
random sequence: recovery is invisible in the output, not just tolerated.

Three pieces:

* **Watchdog** — ``watchdog_call`` bounds every blocking device readback
  (the drain in ``SimulationRunner._drain_batch``); a hung runtime RPC
  raises ``WatchdogTimeout`` instead of blocking forever, turning a hang
  into a recoverable failure.
* **Elastic retry** — ``run_resilient`` wraps ``SimulationRunner.run``:
  on any failure it rebuilds the runner from scratch (fresh compile /
  AOT-cache load), resumes from the last checkpoint, trims the CSV rows
  written past that checkpoint (``io.writer.truncate_rows``), and
  retries.  The retry budget counts *consecutive failures without
  progress* — a retry that advanced the step counter refills it, so a
  long run survives many transient faults but a deterministic crash
  still fails fast.
* **Fault injection** — ``FaultInjector`` plus the ``fault_hook`` seam
  in ``SimulationRunner.run`` let tests (and users doing chaos drills)
  raise device-failure-shaped errors at chosen sprints and prove the
  recovered output bitwise-equal to an uninterrupted run
  (tests/test_resilience.py).

Process-level recovery falls out of the same machinery: re-running the
same CLI command (``mri-t2-sim --checkpoint C --checkpoint-every N
--max-retries R``) after a process death auto-resumes from C and trims
the CSV overhang, so the two layers compose.
"""

from __future__ import annotations

import os
import sys
import threading
from typing import Callable, Optional

import numpy as np

from ..io import writer as writer_mod


class WatchdogTimeout(RuntimeError):
    """A bounded device interaction exceeded its deadline."""


def watchdog_call(fn: Callable, timeout_s: float, what: str = "device call"):
    """Run ``fn()`` under a deadline; raise WatchdogTimeout if it does not
    finish within ``timeout_s`` seconds.

    The call runs in a daemon thread: if it is truly wedged (a hung
    runtime RPC) the thread is abandoned — the caller is expected to
    tear the runner down and rebuild, which is exactly what
    ``run_resilient`` does.  Exceptions raised by ``fn`` propagate."""
    result: list = []
    error: list = []

    def target():
        try:
            result.append(fn())
        except BaseException as e:   # noqa: BLE001 — relayed to caller
            error.append(e)

    t = threading.Thread(target=target, daemon=True)
    t.start()
    t.join(timeout_s)
    if t.is_alive():
        raise WatchdogTimeout(
            f"{what} exceeded the {timeout_s:g}s watchdog deadline")
    if error:
        raise error[0]
    return result[0]


class FaultInjector:
    """Raise a device-failure-shaped error at chosen sprint indices.

    ``fail_at`` maps absolute sprint index -> number of times to fail
    there (so a retry that reaches the same sprint again succeeds once
    the budget is spent — the transient-fault shape).  Pass as
    ``fault_hook`` to ``SimulationRunner.run`` / ``run_resilient``."""

    def __init__(self, fail_at: dict, exc_type=RuntimeError):
        self.fail_at = dict(fail_at)
        self.exc_type = exc_type
        self.faults_fired = 0

    def __call__(self, sprint_index: int) -> None:
        left = self.fail_at.get(sprint_index, 0)
        if left > 0:
            self.fail_at[sprint_index] = left - 1
            self.faults_fired += 1
            raise self.exc_type(
                f"injected fault at sprint {sprint_index}")


def _checkpoint_step(path: Optional[str]) -> int:
    if not path or not os.path.exists(path):
        return 0
    try:
        with np.load(path) as z:
            return int(z["step"])
    except Exception:
        # a checkpoint torn by the failure itself counts as no progress;
        # the retry restarts from the previous intact state (step 0 if
        # none) rather than crashing the recovery machinery
        return 0


def trim_csv_overhang(runner, csv_path: str) -> int:
    """Drop CSV rows written past a just-resumed runner's checkpoint
    step (the checkpoint path force-drains first, so the rows on disk
    are always at-or-ahead of it; an append-mode writer would duplicate
    the overhang).  The resumed run re-produces the trimmed rows
    bitwise (counter-based RNG).  Returns the resumed step."""
    start = int(np.asarray(runner.state.step))
    dropped = writer_mod.truncate_rows(csv_path, start // runner.params.pfreq)
    if dropped:
        print(f"  recovery: trimmed {dropped} CSV row(s) written past "
              f"the checkpoint (step {start})", file=sys.stderr)
    return start


def _resume_if_possible(runner, checkpoint_path: str,
                        csv_path: str) -> int:
    """Resume from the checkpoint when one exists and is readable;
    returns the step resumed from (0 when starting fresh).

    A torn/unreadable file (half-written by a crash — should be
    impossible now that save_checkpoint renames atomically, but disks
    and NFS exist) is warned about and skipped: the attempt restarts
    from scratch rather than wedging recovery.  A *semantic* mismatch
    (params fingerprint / seeds / engine / rng_impl — all ValueError
    from load_checkpoint) stays fatal: retrying cannot fix a config
    error, and silently discarding the checkpoint would overwrite the
    very run the user asked to continue."""
    if not os.path.exists(checkpoint_path):
        return 0
    try:
        runner.resume(checkpoint_path)
    except ValueError:
        raise
    except Exception as e:   # noqa: BLE001 — torn file tolerance
        print(f"  recovery: checkpoint {checkpoint_path} unreadable "
              f"({type(e).__name__}: {e}); restarting from scratch",
              file=sys.stderr)
        return 0
    return trim_csv_overhang(runner, csv_path)


def run_resilient(make_runner: Callable, csv_path: str,
                  checkpoint_path: Optional[str] = None,
                  checkpoint_every_sprints: int = 1,
                  quadrature: bool = False, drain_depth: int = 32,
                  max_retries: int = 3,
                  drain_timeout_s: Optional[float] = None,
                  fault_hook=None, progress: bool = True,
                  max_steps: Optional[int] = None):
    """``SimulationRunner.run`` with bounded elastic recovery.

    ``make_runner`` builds a FRESH ``SimulationRunner`` (it is called
    once per attempt: after a failure the old runner's device state and
    possibly its runtime connection are gone).  The whole attempt —
    rebuild, resume, run — sits inside the recovery boundary, so a
    failure while *recompiling or resuming* consumes retry budget like
    any other.  Returns the same ``(times_ms, sum_cos, sum_sin, stats)``
    contract as ``run``, plus ``stats['recovery_attempts']``.

    ``csv_path`` is required: it is both the durable output and the
    only complete record of the curve when an attempt fails after
    emitting windows (the failed attempt's in-memory windows die with
    it).  After any recovery the curve is re-read from the CSV;
    with ``quadrature=False`` the 2-column CSV has no sum-sin data, so
    ``sum_sin`` is returned as NaNs in that case (loudly absent, never
    silently zero — pass quadrature=True if you consume it).

    ``max_retries`` bounds consecutive failures *without progress*
    (progress = the checkpoint step advanced since the last failure).
    """
    if csv_path is None:
        raise ValueError(
            "run_resilient requires a csv_path: a failed attempt's "
            "undrained windows are lost with it, and only the CSV "
            "carries the full recovered curve")
    if checkpoint_path is None:
        raise ValueError(
            "elastic recovery requires a checkpoint_path: without one a "
            "device failure loses all walker state and there is nothing "
            "to recover from")
    if checkpoint_every_sprints < 1:
        raise ValueError(
            "elastic recovery requires checkpoint_every_sprints >= 1 "
            "(a run that only checkpoints at the end always restarts "
            "from scratch)")
    if max_retries < 0:
        raise ValueError("max_retries must be >= 0")

    failures_without_progress = 0
    attempts = 0
    last_failed_step = -1
    resumed_from = 0
    while True:
        attempts += 1
        try:
            runner = make_runner()
            resumed_from = _resume_if_possible(runner, checkpoint_path,
                                               csv_path)
            times, cos, sin, stats = runner.run(
                csv_path=csv_path, quadrature=quadrature,
                checkpoint_path=checkpoint_path,
                checkpoint_every_sprints=checkpoint_every_sprints,
                progress=progress, max_steps=max_steps,
                drain_depth=drain_depth, fault_hook=fault_hook,
                drain_timeout_s=drain_timeout_s)
        except (KeyboardInterrupt, SystemExit):
            raise
        except ValueError:
            # config/contract errors (fingerprint, seeds, bad params)
            # are not transient: retrying cannot fix them
            raise
        except Exception as e:   # noqa: BLE001 — the recovery boundary
            reached = _checkpoint_step(checkpoint_path)
            if reached > last_failed_step:
                failures_without_progress = 1   # progress since last fail
            else:
                failures_without_progress += 1
            last_failed_step = max(last_failed_step, reached)
            if failures_without_progress > max_retries:
                raise
            print(f"  recovery: {type(e).__name__}: {e} — rebuilding "
                  f"and resuming from step {reached} "
                  f"(failure {failures_without_progress}/{max_retries} "
                  f"without progress)", file=sys.stderr)
            continue

        stats = dict(stats)
        stats["recovery_attempts"] = attempts - 1
        if attempts > 1 or resumed_from:
            # the last attempt only saw the resumed tail — whether the
            # resume happened after an in-process failure OR on the very
            # first attempt (re-run after a process death, checkpoint
            # already on disk); the CSV holds the whole
            # (bitwise-continuous) curve
            cols = writer_mod.read_t2_csv(csv_path)
            times = cols[0]
            cos = cols[1]
            sin = cols[2] if len(cols) > 2 \
                else np.full_like(cos, np.nan)
        return times, cos, sin, stats
