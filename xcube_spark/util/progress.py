"""Progress observation framework.

API parity with the reference's ``xcube/util/progress.py`` (ProgressState
:14-99, ProgressObserver :102-117, observe_progress :239-289,
add_progress_observers :218-236, new_progress_observers :199-215) minus
the dask callback observer — Spark drives work through lazy plans, so
long-running steps report via explicit ``worked()`` calls (and the gen2
service thread, see ``server.py`` /cubegens).

Semantics: a nested stack of (label, total_work) frames.  ``worked(w)``
adds ``w`` units to the innermost frame and propagates the proportional
share to every outer frame (an inner frame entered under
``will_work(k)`` accounts for ``k`` units of its parent).  Observers
receive begin/update/end events with the full frame stack.
"""

from __future__ import annotations

import threading
import time
import traceback as _tb
from collections.abc import Sequence


class ProgressState:
    """One frame of the progress stack: a labeled amount of work."""

    def __init__(self, label: str, total_work: float, super_work: float):
        if not label:
            raise ValueError("label must be given")
        if not total_work > 0:
            raise ValueError("total_work must be greater than zero")
        self.label = label
        self.total_work = float(total_work)
        self.super_work = float(super_work)
        self.super_work_ahead = 1.0
        self.completed_work = 0.0
        self.finished = False
        self.exc_info: tuple | None = None
        self.total_time: float | None = None
        self._t0 = time.perf_counter()

    @property
    def progress(self) -> float:
        return self.completed_work / self.total_work

    @property
    def exc_info_text(self) -> tuple[str, str, list[str]] | None:
        if not self.exc_info:
            return None
        et, ev, etb = self.exc_info
        return (type(ev).__name__, f"{ev}",
                _tb.format_exception(et, ev, etb))

    def to_super_work(self, work: float) -> float:
        return self.super_work * work / self.total_work

    def inc_work(self, work: float) -> None:
        if not work > 0:
            raise ValueError("work must be greater than zero")
        self.completed_work += work

    def finish(self) -> None:
        self.finished = True
        self.total_time = time.perf_counter() - self._t0


class ProgressObserver:
    """Notified on progress-stack changes inside ``observe_progress``
    blocks.  Subclass and override any of the three hooks."""

    def on_begin(self, state_stack: Sequence[ProgressState]) -> None:
        pass

    def on_update(self, state_stack: Sequence[ProgressState]) -> None:
        pass

    def on_end(self, state_stack: Sequence[ProgressState]) -> None:
        pass

    def activate(self) -> None:
        _context().observers.append(self)

    def deactivate(self) -> None:
        try:
            _context().observers.remove(self)
        except ValueError:
            pass


class _Context:
    """Observer set + frame stack (per process; guarded by a lock so a
    server job thread and its pollers don't race)."""

    def __init__(self, *observers: ProgressObserver):
        self.observers: list[ProgressObserver] = list(observers)
        self.stack: list[ProgressState] = []
        self.lock = threading.RLock()

    def _emit(self, hook: str) -> None:
        for ob in list(self.observers):
            getattr(ob, hook)(tuple(self.stack))

    def begin(self, label: str, total_work: float) -> ProgressState:
        with self.lock:
            super_work = (self.stack[-1].super_work_ahead
                          if self.stack else 1.0)
            state = ProgressState(label, total_work, super_work)
            self.stack.append(state)
            self._emit("on_begin")
            return state

    def end(self, exc_type, exc_value, exc_traceback) -> ProgressState:
        with self.lock:
            state = self.stack[-1]
            if exc_type or exc_value or exc_traceback:
                state.exc_info = (exc_type, exc_value, exc_traceback)
            state.finish()
            self._emit("on_end")
            self.stack.pop()
            if self.stack:
                self.stack[-1].super_work_ahead = 1.0
            return state

    def worked(self, work: float) -> None:
        with self.lock:
            if not self.stack:
                raise RuntimeError(
                    "worked() called outside an observe_progress block")
            for state in reversed(self.stack):
                state.inc_work(work)
                work = state.to_super_work(work)
            self._emit("on_update")

    def will_work(self, work: float) -> None:
        with self.lock:
            if not self.stack:
                raise RuntimeError(
                    "will_work() called outside an observe_progress block")
            if not work > 0:
                raise ValueError("work must be greater than zero")
            self.stack[-1].super_work_ahead = work


#: one context per thread: server gen2 job threads each observe their
#: own frame stack (the reference's process-global singleton would
#: interleave concurrent jobs' frames)
_TLS = threading.local()


def _context() -> _Context:
    ctx = getattr(_TLS, "ctx", None)
    if ctx is None:
        ctx = _TLS.ctx = _Context()
    return ctx


def _swap_context(ctx: _Context) -> _Context:
    old = _context()
    _TLS.ctx = ctx
    return old


class observe_progress:
    """Context manager opening a progress frame::

        with observe_progress("ingest", 3) as p:
            step_one(); p.worked(1)
            p.will_work(2)
            with observe_progress("heavy", 10) as q:
                ...
                q.worked(10)
    """

    def __init__(self, label: str, total_work: float):
        self._label = label
        self._total_work = total_work
        self._state: ProgressState | None = None

    @property
    def label(self) -> str:
        return self._label

    @property
    def total_work(self) -> float:
        return self._total_work

    @property
    def state(self) -> ProgressState:
        if self._state is None:
            raise RuntimeError(
                "observe_progress must be used as a context manager")
        return self._state

    def __enter__(self) -> "observe_progress":
        self._state = _context().begin(self._label, self._total_work)
        return self

    def __exit__(self, exc_type, exc_value, exc_traceback) -> None:
        _context().end(exc_type, exc_value, exc_traceback)

    def worked(self, work: float) -> None:
        self.state  # asserts in-context
        _context().worked(work)

    def will_work(self, work: float) -> None:
        self.state
        _context().will_work(work)


class add_progress_observers:
    """Adds observers for the enclosed context; outer observers stay
    active."""

    def __init__(self, *observers: ProgressObserver):
        self._observers = observers

    def __enter__(self) -> None:
        for ob in self._observers:
            ob.activate()

    def __exit__(self, *exc) -> None:
        for ob in self._observers:
            ob.deactivate()


class new_progress_observers:
    """Replaces all observers for the enclosed context; outer observers
    are suspended until exit."""

    def __init__(self, *observers: ProgressObserver):
        self._observers = observers
        self._old: _Context | None = None

    def __enter__(self) -> None:
        self._old = _swap_context(_Context(*self._observers))

    def __exit__(self, *exc) -> None:
        _swap_context(self._old)


class observe_spark_progress:
    """Observe Spark task progress inside the enclosed context — the
    Spark twin of the reference's ``observe_dask_progress``
    (util/progress.py:291-352, a dask scheduler callback): a sampler
    thread polls the SparkContext status tracker for active stages and
    reports completed-task deltas as work units.

    ``total_work`` is nominal (tasks are reported proportionally up to
    it); use when a block runs one dominant Spark action::

        with observe_spark_progress(spark, "writing cube", 100):
            df.write.parquet(path)
    """

    def __init__(self, spark, label: str, total_work: float = 100.0,
                 interval: float = 0.1):
        self._sc = spark.sparkContext
        self._label = label
        self._total_work = float(total_work)
        self._interval = interval
        self._stop = threading.Event()
        self._thread: threading.Thread | None = None
        self._worked = 0.0
        self._ctx: _Context | None = None

    def _sample(self) -> None:
        tracker = self._sc.statusTracker()
        seen_done = 0
        total = 0
        while not self._stop.wait(self._interval):
            try:
                done = 0
                ntasks = 0
                for sid in tracker.getActiveStageIds():
                    info = tracker.getStageInfo(sid)
                    if info is not None:
                        done += info.numCompletedTasks
                        ntasks += info.numTasks
                total = max(total, ntasks)
                if total > 0 and done > seen_done:
                    frac = min(done / total, 1.0)
                    target = frac * self._total_work
                    if target > self._worked:
                        self._ctx.worked(target - self._worked)
                        self._worked = target
                    seen_done = done
            except Exception:
                pass  # tracker races with job teardown — keep sampling

    def __enter__(self) -> "observe_spark_progress":
        self._ctx = _context()
        self._ctx.begin(self._label, self._total_work)
        self._thread = threading.Thread(target=self._sample, daemon=True)
        self._thread.start()
        return self

    def __exit__(self, exc_type, exc_value, exc_traceback) -> None:
        self._stop.set()
        if self._thread is not None:
            self._thread.join(timeout=5)
        if exc_type is None and self._worked < self._total_work:
            # the action finished: account the remainder
            self._ctx.worked(self._total_work - self._worked)
        self._ctx.end(exc_type, exc_value, exc_traceback)
