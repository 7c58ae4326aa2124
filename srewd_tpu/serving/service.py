"""Production inference serving for trained diffusion SR models.

The reference has no serving story — inference is `sample.py`, one
synchronous date-targeted run per process (reference sample.py:16-60).
For deployment this module adds a persistent in-process service around
ONE compiled sampling program:

* fixed device batch B (the throughput-optimal batch from the DESIGN.md
  sweep): requests of arbitrary size are split/packed into device batches
  of exactly B fields and the tail is padded (padding rows are sliced off
  before futures resolve) — the MXU always sees the shape the program was
  compiled for, so there is never a per-request retrace;
* two-stage pipeline: the dispatcher thread issues device calls without
  blocking on results (JAX async dispatch), a resolver thread blocks on
  the host transfer and resolves futures — device compute overlaps host
  IO exactly like `train_on_batch_async` (training/trainer.py, DESIGN §8);
* physical units at the boundary: requests carry Kelvin LR fields and
  month indices; the service applies the train-time scalers on the way in
  and the HR inverse on the way out (data/scalers.MonthlyScalerSet), so a
  caller never sees normalized space.

Determinism: device batch k draws its chain noise from
``fold_in(key(seed), k)`` — a fixed seed and request order reproduce the
exact fields, and distinct batches never share a noise realization
(the concern bulk sampling's ``fold`` solves in sample.py).
"""

from __future__ import annotations

import queue
import threading
import time
from concurrent.futures import Future
from typing import Callable, Optional

import numpy as np

import jax
import jax.numpy as jnp


class _Pending:
    """One request's result assembly: fields may span device batches."""

    __slots__ = ("future", "buffer", "n_fields", "remaining", "t_submit")

    def __init__(self, n_fields: int):
        self.future: Future = Future()
        self.buffer: Optional[np.ndarray] = None  # allocated on first part
        self.n_fields = n_fields
        self.remaining = n_fields
        self.t_submit = time.monotonic()


class SamplerService:
    """Persistent batched SR inference over one compiled sampling program."""

    def __init__(
        self,
        model,
        params: dict,
        schedule,
        *,
        batch_size: int = 8,
        mesh=None,
        sampler_kwargs: Optional[dict] = None,
        transform_lr: Optional[Callable] = None,
        inverse_hr: Optional[Callable] = None,
        linger_ms: float = 2.0,
        seed: int = 0,
    ):
        from ..parallel.mesh import make_mesh

        self.model = model
        self.params = params
        self.schedule = schedule
        self.batch_size = int(batch_size)
        self.mesh = mesh if mesh is not None else make_mesh()
        self.sampler_kwargs = dict(sampler_kwargs or {})
        # identity scalers by default: caller works in normalized space
        self._transform_lr = transform_lr or (lambda x, m: x)
        self._inverse_hr = inverse_hr or (lambda x, m: x)
        self._linger_s = float(linger_ms) / 1e3
        self._base_key = jax.random.key(seed)

        self._sample_fn = self._build_sample_fn()

        self._lock = threading.Condition()
        self._slots: list = []  # [(pending, offset, lr_row, month)], FIFO
        self._lr_shape = None  # [lh, lw, C], locked at first submit
        self._closing = False
        self._batch_seq = 0
        self._stats = {
            "requests": 0,
            "fields": 0,
            "device_batches": 0,
            "padded_fields": 0,
        }
        self._latencies: list = []  # bounded; request wall seconds

        self._resolve_q: "queue.Queue" = queue.Queue(maxsize=4)
        self._dispatcher = threading.Thread(
            target=self._dispatch_loop, name="srewd-serve-dispatch", daemon=True
        )
        self._resolver = threading.Thread(
            target=self._resolve_loop, name="srewd-serve-resolve", daemon=True
        )
        self._dispatcher.start()
        self._resolver.start()

    # ------------------------------------------------------------ factories
    @classmethod
    def from_trainer(cls, trainer, data_handler=None, use_ema: bool = False, **kw):
        """Serve a SNAPSHOT of a live/trained DiffusionTrainer's weights.

        The param tree is copied: the trainer's jitted train/EMA steps donate
        their param buffers (trainer.py donate_argnums), so serving the live
        references would raise 'Array has been deleted' on the first train
        step after construction. Push fresh weights with update_params().

        data_handler supplies the train-time scalers (Kelvin boundary);
        without it the service runs in normalized space.
        """
        import jax.numpy as jnp

        params = (
            trainer.ema_params
            if (use_ema and trainer.ema_params is not None)
            else trainer.params
        )
        params = jax.tree.map(jnp.copy, params)
        if data_handler is not None:
            sc = data_handler.batch_scalers
            kw.setdefault("transform_lr", sc["lr"].transform)
            kw.setdefault("inverse_hr", sc["hr"].inverse)
        kw.setdefault("sampler_kwargs", trainer.sampler_kwargs)
        return cls(trainer.model, params, trainer.schedule_val,
                   mesh=trainer.mesh, **kw)

    @classmethod
    def from_checkpoint(cls, config_path: str, model_path: Optional[str] = None,
                        use_ema: bool = False,
                        diffusion_overrides: Optional[dict] = None, **kw):
        """Build the full stack (config -> data scalers -> weights) and serve.

        Mirrors sample.py's setup path: the config's dataroot fits the
        scalers; `model_path` (or path.resume_state) supplies the weights.
        `diffusion_overrides` merges into model.diffusion BEFORE the trainer
        is built (sampler / ddim_steps / clip_denoised CLI flags), so they
        compose with config-set knobs instead of replacing them.
        """
        from ..cli import build_data_handler, build_trainer
        from ..configs.config import Config

        cfg = Config(config_path, phase="val", experiment=False)
        opt = cfg.get_opt()
        if model_path:
            opt["path"]["resume_state"] = model_path
        if diffusion_overrides:
            opt["model"].setdefault("diffusion", {}).update(diffusion_overrides)
        dh = build_data_handler(opt)
        example = next(iter(dh.val_batches()))
        trainer = build_trainer(opt, example)
        return cls.from_trainer(trainer, data_handler=dh, use_ema=use_ema, **kw)

    # ------------------------------------------------------------- compiled
    def _build_sample_fn(self):
        from ..models.blocks import spmd_mesh

        model, mesh, schedule = self.model, self.mesh, self.schedule
        sampler_kwargs = self.sampler_kwargs

        @jax.jit
        def sample_fn(params, lr, key):
            with spmd_mesh(mesh):
                return model.generate_sr(
                    params, {"LR": lr}, key, schedule, **sampler_kwargs
                )

        return sample_fn

    # --------------------------------------------------------------- public
    def submit(self, lr_kelvin: np.ndarray, months: np.ndarray) -> Future:
        """Queue [n, lh, lw, C] LR fields; future resolves to [n, hh, hw, C] SR."""
        lr = np.asarray(lr_kelvin, np.float32)
        months = np.asarray(months, np.int32).reshape(-1)
        if lr.ndim != 4 or lr.shape[0] != months.shape[0] or lr.shape[0] == 0:
            raise ValueError(
                f"expected non-empty lr [n,lh,lw,C] with matching months[n], "
                f"got {lr.shape} / {months.shape}"
            )
        lr = np.asarray(self._transform_lr(lr, months), np.float32)
        pending = _Pending(lr.shape[0])
        with self._lock:
            if self._closing:
                raise RuntimeError("service is closed")
            # one compiled shape per service: a mismatched field would either
            # retrace (violating the fixed-shape design) or kill the
            # dispatcher's np.stack — reject it at the boundary instead
            if self._lr_shape is None:
                self._lr_shape = lr.shape[1:]
            elif lr.shape[1:] != self._lr_shape:
                raise ValueError(
                    f"LR field shape {lr.shape[1:]} does not match the "
                    f"service's compiled shape {self._lr_shape}"
                )
            for i in range(lr.shape[0]):
                self._slots.append((pending, i, lr[i], months[i]))
            self._stats["requests"] += 1
            self._stats["fields"] += lr.shape[0]
            self._lock.notify_all()
        return pending.future

    def super_resolve(self, lr_kelvin, months) -> np.ndarray:
        """Synchronous convenience wrapper around submit()."""
        return self.submit(lr_kelvin, months).result()

    def update_params(self, params: dict) -> None:
        """Hot-swap the served weights with zero downtime.

        The compiled program is shape-polymorphic in nothing — same tree
        structure, leaf shapes and dtypes means no retrace; in-flight
        batches finish on the old weights, batches dispatched after the
        swap use the new ones (the dispatcher reads self.params per device
        call; the assignment is atomic under the GIL)."""
        import jax as _jax

        old = _jax.tree.structure(self.params)
        new = _jax.tree.structure(params)
        if old != new:
            raise ValueError(
                f"param tree mismatch: served {old} vs update {new}")
        for po, pn in zip(_jax.tree.leaves(self.params),
                          _jax.tree.leaves(params)):
            so = getattr(po, "shape", ())
            sn = getattr(pn, "shape", ())
            do = getattr(po, "dtype", None)
            dn = getattr(pn, "dtype", None)
            if so != sn or do != dn:
                raise ValueError(
                    f"param leaf mismatch: served {so}/{do} vs update "
                    f"{sn}/{dn} — a swap must not retrace the compiled "
                    f"program")
        self.params = params

    def stats(self) -> dict:
        with self._lock:
            out = dict(self._stats)
            lat = sorted(self._latencies)
        if lat:
            out["latency_p50_ms"] = round(1e3 * lat[len(lat) // 2], 2)
            out["latency_p95_ms"] = round(1e3 * lat[int(len(lat) * 0.95)], 2)
        out["batch_size"] = self.batch_size
        return out

    def close(self) -> None:
        """Drain queued work, stop threads. Idempotent."""
        with self._lock:
            self._closing = True
            self._lock.notify_all()
        self._dispatcher.join()
        self._resolve_q.put(None)
        self._resolver.join()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    # -------------------------------------------------------------- threads
    def _take_batch(self) -> Optional[list]:
        """Block until work (or close); linger briefly to coalesce, then pop
        up to batch_size slots. Returns None only on close-and-drained."""
        with self._lock:
            while not self._slots and not self._closing:
                self._lock.wait()
            if not self._slots:
                return None
            # linger: give concurrent submitters a beat to fill the batch
            deadline = time.monotonic() + self._linger_s
            while (
                not self._closing
                and len(self._slots) < self.batch_size
                and (remain := deadline - time.monotonic()) > 0
            ):
                self._lock.wait(timeout=remain)
            take = self._slots[: self.batch_size]
            del self._slots[: self.batch_size]
            return take

    def _dispatch_loop(self) -> None:
        while True:
            slots = self._take_batch()
            if slots is None:
                break
            n = len(slots)
            pad = self.batch_size - n
            try:
                lr = np.stack([s[2] for s in slots] + [slots[0][2]] * pad)
            except Exception as e:  # pragma: no cover - submit() pre-validates
                self._fail_slots(slots, e)
                continue
            months = np.asarray([s[3] for s in slots], np.int32)
            with self._lock:
                seq = self._batch_seq
                self._batch_seq += 1
                self._stats["device_batches"] += 1
                self._stats["padded_fields"] += pad
            try:
                key = jax.random.fold_in(self._base_key, seq)
                out = self._sample_fn(self.params, jnp.asarray(lr), key)
            except Exception as e:  # compile/dispatch error -> fail these slots
                self._fail_slots(slots, e)
                continue
            self._resolve_q.put((slots, out, months))

    def _resolve_loop(self) -> None:
        while True:
            item = self._resolve_q.get()
            if item is None:
                break
            slots, out, months = item
            try:
                sr = np.asarray(out)[: len(slots)]
                sr = np.asarray(self._inverse_hr(sr, months), np.float32)
            except Exception as e:
                self._fail_slots(slots, e)
                continue
            for row, (pending, i, _, _) in zip(sr, slots):
                if pending.future.done():
                    # an earlier device batch of this request failed (or the
                    # caller cancelled) — don't set_result on a done future,
                    # that would raise InvalidStateError and kill this thread
                    continue
                if pending.buffer is None:
                    # allocate lazily now that the SR field shape is known
                    pending.buffer = np.empty(
                        (pending.n_fields,) + row.shape, np.float32
                    )
                pending.buffer[i] = row
                pending.remaining -= 1
                if pending.remaining == 0:
                    with self._lock:
                        self._latencies.append(time.monotonic() - pending.t_submit)
                        del self._latencies[:-512]  # bound memory
                    if not pending.future.done():
                        pending.future.set_result(pending.buffer)

    def _fail_slots(self, slots, exc: Exception) -> None:
        seen = set()
        for pending, _, _, _ in slots:
            if id(pending) not in seen:
                seen.add(id(pending))
                if not pending.future.done():
                    pending.future.set_exception(exc)
