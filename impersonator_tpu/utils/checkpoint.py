"""Checkpointing: params + optimizer pytrees, reference naming contract.

The reference saves ``net_epoch_{E}_id_{G|D}.pth`` / ``opt_epoch_{E}_id_*``
per epoch plus timed "latest" snapshots (models/models.py:133-151,
train.py:86-89). We keep the same layout with ``.msgpack`` pytrees
(flax.serialization), so resume tooling and epoch discovery carry over.
"""

from __future__ import annotations

import os
import queue
import re
import threading
from typing import Any

from flax import serialization


def _path(expr_dir: str, kind: str, epoch, label: str) -> str:
    return os.path.join(expr_dir, f"{kind}_epoch_{epoch}_id_{label}.msgpack")


def _write_atomic(path: str, data: bytes) -> None:
    """tmp + rename so a crash mid-save never leaves a truncated
    checkpoint that breaks resolve_load_epoch's resume."""
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(data)
    os.replace(tmp, path)


def save_network(params: Any, expr_dir: str, label: str, epoch) -> str:
    """kind='net' save (BaseModel._save_network, models.py:133-138)."""
    os.makedirs(expr_dir, exist_ok=True)
    path = _path(expr_dir, "net", epoch, label)
    _write_atomic(path, serialization.to_bytes(params))
    return path


def load_network(template: Any, expr_dir: str, label: str, epoch) -> Any:
    """kind='net' load into a template pytree (models.py:153-161)."""
    path = _path(expr_dir, "net", epoch, label)
    if not os.path.exists(path):
        raise FileNotFoundError(f"checkpoint not found: {path}")
    with open(path, "rb") as f:
        return serialization.from_bytes(template, f.read())


def save_optimizer(opt_state: Any, expr_dir: str, label: str, epoch) -> str:
    os.makedirs(expr_dir, exist_ok=True)
    path = _path(expr_dir, "opt", epoch, label)
    _write_atomic(path, serialization.to_bytes(opt_state))
    return path


def load_optimizer(template: Any, expr_dir: str, label: str, epoch) -> Any:
    path = _path(expr_dir, "opt", epoch, label)
    if not os.path.exists(path):
        raise FileNotFoundError(f"optimizer checkpoint not found: {path}")
    with open(path, "rb") as f:
        return serialization.from_bytes(template, f.read())


def latest_epoch(expr_dir: str, label: str = "G") -> int:
    """Scan for the newest epoch (BaseOptions epoch auto-discovery,
    base_options.py:99-117). Returns 0 when none exist."""
    if not os.path.isdir(expr_dir):
        return 0
    best = 0
    pat = re.compile(rf"net_epoch_(\d+)_id_{label}\.msgpack$")
    for name in os.listdir(expr_dir):
        m = pat.match(name)
        if m:
            best = max(best, int(m.group(1)))
    return best


def save_train_state(state, expr_dir: str, epoch) -> None:
    """Save the full GAN train state with the reference's file split."""
    save_network(state.g_params, expr_dir, "G", epoch)
    save_network(state.d_params, expr_dir, "D", epoch)
    save_optimizer(state.g_opt, expr_dir, "G", epoch)
    save_optimizer(state.d_opt, expr_dir, "D", epoch)


def load_train_state(state, expr_dir: str, epoch):
    """Restore params + optimizer states into a template TrainState."""
    return state._replace(
        g_params=load_network(state.g_params, expr_dir, "G", epoch),
        d_params=load_network(state.d_params, expr_dir, "D", epoch),
        g_opt=load_optimizer(state.g_opt, expr_dir, "G", epoch),
        d_opt=load_optimizer(state.d_opt, expr_dir, "D", epoch),
    )


class AsyncCheckpointer:
    """Background-thread checkpoint writer (orbax-style async save,
    SURVEY §5: the reference's torch.save blocks its epoch loop).

    msgpack-serializing + writing the four G/D param/optimizer pytrees
    stalls the step loop for seconds at production sizes. Nothing in
    the train loop donates buffers — a superseded TrainState's arrays
    stay immutable on device — so the worker thread can device_get,
    serialize and atomically rename while the next steps run. Saves for
    the same (expr_dir, epoch) key supersede queued ones ("latest"
    snapshots never back up behind a slow disk). Call :meth:`wait`
    before reading the files or exiting."""

    def __init__(self):
        self._q: queue.Queue = queue.Queue()
        self._err = None
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._thread.start()

    def _run(self):
        while True:
            item = self._q.get()
            if item is None:
                self._q.task_done()
                return
            state, expr_dir, epoch = item
            try:
                save_train_state(state, expr_dir, epoch)
            except Exception as e:  # surfaced on the next wait()
                self._err = e
            finally:
                self._q.task_done()

    def submit(self, state, expr_dir: str, epoch) -> None:
        # drop queued saves for the same key — only the newest matters
        import jax
        state = jax.tree_util.tree_map(lambda x: x, state)
        pending = []
        try:
            while True:
                it = self._q.get_nowait()
                self._q.task_done()
                if it is not None and (it[1], it[2]) == (expr_dir, epoch):
                    continue
                pending.append(it)
        except queue.Empty:
            pass
        for it in pending:
            self._q.put(it)
        self._q.put((state, expr_dir, epoch))

    def wait(self) -> None:
        """Block until every queued save is on disk; re-raise the first
        writer error."""
        self._q.join()
        if self._err is not None:
            err, self._err = self._err, None
            raise err

    def close(self) -> None:
        self.wait()
        self._q.put(None)
        self._thread.join(timeout=30)
