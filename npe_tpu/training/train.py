"""IAN training driver (reference `train_IAN.py:378-581`).

Keeps the reference's observable behavior -- chunked epochs, alternating
G/D updates by `itr % (update_ratio+1)`, per-chunk JSONL metrics with the
periodic header table, per-epoch 6x9 sample/interpolation grids, name-keyed
.npz weight checkpoints with {epoch, itr, ts, learning_rate} metadata, and
`--resume` -- while fixing its known gaps: optimizer state and PRNG key are
checkpointed too (the reference restarted Adam moments from zero,
SURVEY.md section 5).

TPU-native: both update steps are single jitted programs; chunks are staged
to device once and batches sliced on-device (the reference's shared-variable
`givens` trick, `train_IAN.py:307-325`); with more than one device the state
and batch are sharded over the ('data','model') mesh and XLA inserts the
gradient all-reduce.

CLI: python -m npe_tpu.training.train IAN_simple --resume ...
"""

import argparse
import logging
import os
import time
from collections import OrderedDict

import jax
import jax.numpy as jnp
import numpy as np

from npe_tpu.data import data_loader, get_dataset
from npe_tpu.models import get_config
from npe_tpu.ops.pallas.staging import stage_chunk
from npe_tpu.training import train_step as TS
from npe_tpu.training.eval_grids import sample_and_interp_grid
from npe_tpu.utils import checkpoints, fetch
from npe_tpu.utils.metrics_logging import MetricsLogger

GEN_KEYS = ["gen_recon_loss", "gen_sample_loss", "pixel_loss", "feature_loss", "pixel_acc"]
DISCRIM_KEYS = ["discrim_g_loss", "discrim_d_loss", "discrim_acc", "pixel_loss", "pixel_acc"]


class AdaptiveRatioGuard:
    """D-saturation guard (documented deviation from the reference's fixed
    alternation, docs/PARITY.md): when the discriminator's running accuracy
    EMA exceeds `threshold`, scheduled D steps are skipped (G trains
    instead). While skipping, the EMA decays toward chance (0.5) -- D is not
    being measured, and an EMA frozen at its last saturated value would
    latch the guard on forever. The decay bounds the skip streak: after a
    few skips the EMA re-crosses the threshold and the next scheduled D step
    probes the real accuracy, re-engaging immediately if D is still
    saturated.

    This class is the HOST-SIDE statement of the semantics (and the oracle
    the tests check against); the production trainer runs the identical
    decision on-device inside the chunk program (train_step.guard_schedule /
    guard_ema_update threaded through the scan)."""

    def __init__(self, threshold, period, decay=0.9, chance=0.5):
        self.threshold = threshold
        self.period = period
        self.decay = decay
        self.chance = chance
        self.ema = 0.5

    def should_gen(self, itr):
        """True if step `itr` should train G (either by the faithful
        alternation or because the guard is skipping a saturated D).

        CONTRACT: call exactly once per training step -- a skip decision
        decays the EMA as a side effect (that decay is what bounds the skip
        streak), so a second call for the same `itr` (e.g. from a logging
        path) would double-decay and change the G/D schedule."""
        if itr % self.period == 0:
            return True
        if self.ema > self.threshold:
            self.ema = self.decay * self.ema + (1 - self.decay) * self.chance
            return True
        return False

    def observe(self, d_acc):
        """Feed the accuracy measured by a D step that actually ran."""
        self.ema = self.decay * self.ema + (1 - self.decay) * float(d_acc)


def current_lr(cfg, epoch, lr):
    if isinstance(cfg["learning_rate"], dict):
        if epoch in cfg["learning_rate"]:
            new = cfg["learning_rate"][epoch]
            if new != lr:
                logging.info("Changing learning rate from %s to %s", lr, new)
            return float(new)
    if cfg.get("decay_rate") and epoch > 0:
        return lr * (1 - cfg["decay_rate"])
    return lr


def restore_masks(loaded, fresh_state):
    """The train state persists the MADE masks (the IAF connectivity
    ordering), so resume uses the checkpointed ones rather than regenerating
    from init -- robust even if the mask protocol or n_shuffles changes
    between runs. Backfill from fresh init only for train states that
    predate mask persistence."""
    for k, v in fresh_state["parts"]["state"].items():
        if k.endswith(".weights_mask") and k not in loaded["parts"]["state"]:
            loaded["parts"]["state"][k] = v
    return loaded


def train(
    config="IAN_simple",
    dataset_spec="synthetic",
    resume=False,
    max_epochs=None,
    num_examples=4096,
    out_dir=".",
    pics_dir="pics",
    seed=0,
    mesh=None,
    checkpoint_grids=True,
    cfg_overrides=None,
    profile_dir=None,
    valid_dataset_spec=None,
    num_valid_examples=1024,
    fid_feature_weights=None,
    state_every=1,
    async_checkpoint=False,
):
    module = get_config(config)
    cfg = dict(module.cfg)
    if max_epochs is not None:
        cfg["max_epochs"] = max_epochs
    if cfg_overrides:
        cfg.update(cfg_overrides)

    name = cfg["model"]
    os.makedirs(out_dir, exist_ok=True)
    weights_fname = os.path.join(out_dir, name + ".npz")
    state_fname = os.path.join(out_dir, name + "_train_state.npz")
    metrics_fname = os.path.join(out_dir, name + "METRICS.jsonl")

    logging.basicConfig(level=logging.INFO, format="%(asctime)s %(levelname)s| %(message)s")
    logging.info("Metrics will be saved to %s", metrics_fname)
    mlog = MetricsLogger(metrics_fname, reinitialize=not resume)

    variables = module.init(jax.random.PRNGKey(seed))
    state = TS.init_train_state(module, variables, cfg)
    # The alternation runs as ONE jitted program per chunk
    # (TS.make_chunk_step: scan over batches, on-device z_rand + metric
    # averaging) -- per-batch host dispatch through the axon tunnel measured
    # 237 ms/step vs the same step's 19.6 ms inside a scan. The adaptive-
    # ratio deviation (cfg['adaptive_ratio_acc'], docs/PARITY.md) runs
    # INSIDE the same program: the guard's data-dependent G/D choice is a
    # lax.cond predicate with the accuracy EMA threaded through the scan, so
    # it costs nothing on the host (the old per-step host-loop guard cost
    # ~12x the step time in tunnel RPCs).
    adaptive_acc = cfg.get("adaptive_ratio_acc")
    # async_checkpoint holds a reference to the epoch-N state while the
    # next chunk runs, so the step must NOT donate its state buffers
    # (donation would delete them under the in-flight fetch).
    chunk_step = TS.make_chunk_step(
        module,
        cfg,
        cfg["batches_per_chunk"],
        donate=not async_checkpoint,
        guard_acc=adaptive_acc,
    )

    itr = 0
    min_epoch = 0
    lr = float(cfg["learning_rate"][0] if isinstance(cfg["learning_rate"], dict) else cfg["learning_rate"])
    if resume and os.path.isfile(state_fname):
        state = restore_masks(checkpoints.load_train_state(state_fname), state)
        # Prefer the state file's own metadata: with state_every>1 the
        # weights file can be NEWER than the opt state, and epoch/lr must
        # stay consistent with the params+moments actually restored.
        meta = checkpoints.train_state_metadata(state_fname)
        if not meta and os.path.isfile(weights_fname):
            meta = checkpoints.load_weights(weights_fname, {})
        min_epoch = int(meta.get("epoch", -1)) + 1
        itr = int(meta.get("itr", 0))
        lr = float(meta.get("learning_rate", lr))
        logging.info("resumed: epoch=%d itr=%d lr=%g", min_epoch, itr, lr)

    if mesh is not None:
        from npe_tpu.parallel.mesh import shard_train_state

        state = shard_train_state(state, mesh)

    # Data source: in-process Python datasets, or the native C++ prefetching
    # loader over a raw record file ('native:<path>' -- export with
    # npe_tpu.data.native_loader.export_raw).
    native = None
    if str(dataset_spec).startswith("native:"):
        from npe_tpu.data.native_loader import NativeChunkLoader

        raw_path = str(dataset_spec)[len("native:"):]
        n_rec = os.path.getsize(raw_path) // (3 * 64 * 64)
        native = NativeChunkLoader(
            raw_path, n_rec, (3, 64, 64), cfg["batch_size"] * cfg["batches_per_chunk"]
        )
        dataset = get_dataset("synthetic", num_examples=num_examples)  # for grids
    else:
        dataset = get_dataset(dataset_spec, num_examples=num_examples)
    # Device-resident dataset cache: when the whole uint8 dataset fits the
    # budget, ship it to HBM ONCE and gather each chunk's batch on-chip --
    # per-chunk index vectors (32 KB) replace the 100 MB uint8 ship, which
    # measured ~3.5 s/chunk over the axon tunnel vs ~1.2 s of step compute.
    # (The reference staged per-chunk onto GPU shared vars,
    # `train_IAN.py:478-484`; a TPU's HBM holds the whole CelebA-scale
    # dataset.) Disabled under a mesh: a replicated cache would defeat
    # sharded data loading.
    device_cache = None
    if native is None and mesh is None:
        cache_budget = int(os.environ.get("NPE_DEVICE_CACHE_BYTES", 2 << 30))
        n_ex = dataset.num_examples
        if n_ex * 3 * 64 * 64 <= cache_budget:
            device_cache = jax.device_put(
                np.uint8(dataset.get_data(np.arange(n_ex)))
            )
    valid_dataset = (
        get_dataset(valid_dataset_spec, num_examples=num_valid_examples)
        if valid_dataset_spec
        else None
    )
    update_ratio = cfg["update_ratio"]
    # Adaptive-ratio guard state: the accuracy EMA lives on-device between
    # chunks (a traced scalar in/out of the chunk program). Like the host
    # guard it starts at chance on every (re)start -- it is measurement
    # state, not model state, and re-converges within ~10 D steps.
    guard_ema = jnp.float32(TS.GUARD_CHANCE) if adaptive_acc else None
    checkpoint_count = 0
    rng = jax.random.PRNGKey(seed + 1)
    offset = True
    # Frozen feature space for encoder-FID: a passed checkpoint, else the
    # first validation checkpoint of this run (set in the loop below and
    # PERSISTED to <name>_fid_basis.npz so a crash-resume keeps the same
    # feature space -- otherwise every resume would silently rebase the FID
    # curve on whatever the encoder looks like at its first checkpoint).
    fid_basis_fname = os.path.join(out_dir, name + "_fid_basis.npz")
    fid_feature_vars = None
    if fid_feature_weights:
        fid_feature_vars = module.init(jax.random.PRNGKey(seed))
        checkpoints.load_weights(fid_feature_weights, fid_feature_vars)
    elif os.path.isfile(fid_basis_fname):
        fid_feature_vars = module.init(jax.random.PRNGKey(seed))
        meta = checkpoints.load_weights(fid_basis_fname, fid_feature_vars)
        logging.info(
            "encoder-FID feature basis restored from %s (epoch %s)",
            fid_basis_fname,
            (meta or {}).get("epoch"),
        )

    ckptr = checkpoints.AsyncCheckpointer() if async_checkpoint else None
    # Consecutive checkpoint-WRITE failures (disk full, permissions...):
    # one is survivable (the previous atomic checkpoint is intact, the next
    # save retries), but a persistent failure would silently leave a
    # multi-hour run with checkpoints hours stale -- escalate so the
    # babysitter/operator notices (ADVICE r3).
    save_failures = [0]

    for epoch in range(min_epoch, cfg["max_epochs"]):
        offset = not offset
        lr = current_lr(cfg, epoch, lr)
        if native is not None:
            from npe_tpu.data.native_loader import native_chunk_loader

            loader = native_chunk_loader(
                cfg,
                None,
                None,
                offset=offset * cfg["batch_size"] // 2,
                shuffle=cfg["shuffle"],
                seed=epoch,
                loader=native,
                raw=True,
            )
        elif device_cache is not None:
            from npe_tpu.data.datasets import index_loader

            loader = index_loader(
                cfg,
                dataset.num_examples,
                offset=offset * cfg["batch_size"] // 2,
                shuffle=cfg["shuffle"],
                seed=epoch,
            )
        else:
            loader = data_loader(
                cfg,
                dataset,
                offset=offset * cfg["batch_size"] // 2,
                shuffle=cfg["shuffle"],
                seed=epoch,
                raw=True,
            )
        iter_counter = 0
        form = None
        for x_chunk in loader:
            iter_counter += 1
            num_batches = len(x_chunk) // cfg["batch_size"]
            perm = np.random.permutation(len(x_chunk))
            # Chunks arrive as raw uint8 NCHW (or as index vectors into the
            # device-resident cache); the host ships the bytes as-is (4x
            # less host->device traffic than float32) and ONE jitted program
            # does gather + cast + to_tanh + NHWC transpose on-chip
            # (reference kept chunks device-resident the same way,
            # train_IAN.py:478-484).
            if device_cache is not None:
                idx = jnp.asarray(np.asarray(x_chunk)[perm], jnp.int32)
                x_dev = stage_chunk(device_cache, idx)
            elif mesh is not None:
                from npe_tpu.parallel.mesh import shard_batch

                # permute the uint8 bytes on host so the on-device gather
                # doesn't become a cross-device all-to-all under GSPMD
                u8_dev = shard_batch(jnp.asarray(x_chunk[perm]), mesh)
                x_dev = stage_chunk(u8_dev, use_pallas=False)
            else:
                x_dev = stage_chunk(x_chunk, perm)

            # On-device trace of the first chunk when profiling is requested.
            if profile_dir and epoch == min_epoch and iter_counter == 1:
                jax.profiler.start_trace(profile_dir)

            assert num_batches == cfg["batches_per_chunk"], (
                num_batches,
                cfg["batches_per_chunk"],
            )  # the chunk program is compiled for full chunks
            if guard_ema is None:
                state, rng, gen_m, dis_m, n_gen = chunk_step(state, x_dev, itr, rng, lr)
            else:
                state, rng, gen_m, dis_m, n_gen, guard_ema = chunk_step(
                    state, x_dev, itr, rng, lr, guard_ema
                )
            # one packed fetch for the ~17 scalar metrics (vs one
            # high-latency RPC each)
            gen_m, dis_m, n_gen = fetch.packed_device_get((gen_m, dis_m, n_gen))
            n_gen = float(n_gen)
            n_dis = num_batches - n_gen
            metrics = OrderedDict()
            for k in list(dict.fromkeys(GEN_KEYS + DISCRIM_KEYS)):
                if k in GEN_KEYS and k in DISCRIM_KEYS:
                    metrics[k] = [
                        (float(gen_m[k]) * n_gen + float(dis_m[k]) * n_dis) / num_batches
                    ]
                elif k in GEN_KEYS:
                    metrics[k] = [float(gen_m[k])] if n_gen else []
                else:
                    metrics[k] = [float(dis_m[k])] if n_dis else []
            if guard_ema is not None:
                # D-slots the guard converted to G steps this chunk -- the
                # faithful alternation schedules ceil(nb/period) G steps.
                period = update_ratio + 1
                scheduled_g = sum(1 for i in range(num_batches) if (itr + i) % period == 0)
                metrics["d_steps_skipped"] = [n_gen - scheduled_g]
            itr += num_batches

            if profile_dir and epoch == min_epoch and iter_counter == 1:
                jax.profiler.stop_trace()
                logging.info("profiler trace written to %s", profile_dir)

            metrics = OrderedDict(
                (k, float(np.mean([np.asarray(x) for x in v]))) for k, v in metrics.items() if v
            )
            if (iter_counter - 1) % 50 == 0:
                logging.info("epoch   itr    " + "  ".join(metrics))
            logging.info(
                "%4d %6d  " % (epoch, itr)
                + "  ".join(("%" + str(len(k)) + ".4f") % v for k, v in metrics.items())
            )
            mlog.log(epoch=epoch, itr=itr, metrics=metrics)

        if not (epoch % cfg["checkpoint_every_nth"]) or epoch == cfg["max_epochs"] - 1:
            checkpoint_count += 1
            variables = TS.variables_of(state)
            if checkpoint_grids:
                os.makedirs(pics_dir, exist_ok=True)
                try:
                    sample_and_interp_grid(
                        module,
                        variables,
                        dataset,
                        os.path.join(pics_dir, f"{name}_{epoch}.png"),
                        seed=epoch * 42 + 5,
                    )
                except jax.errors.JaxRuntimeError as e:
                    # Transient backend failure (e.g. a dropped remote-TPU
                    # tunnel during the device->host image fetch) must not
                    # kill an hours-long run over an eval artifact; the grid
                    # for this epoch is simply skipped.
                    logging.warning("checkpoint grid skipped (backend error): %s", e)
            meta = {"epoch": epoch, "itr": itr, "ts": time.time(), "learning_rate": lr}
            # Full opt-state saves are ~3x the weights; over a slow
            # host<->device link the per-leaf device_get dominates the
            # checkpoint, so (a) fetches are PACKED (one transfer per dtype,
            # utils/fetch.py) and (b) state_every>1 throttles the state save
            # (weights still save every checkpoint, like the reference's
            # per-epoch npz, `train_IAN.py:567-571`). Metadata rides in the
            # state file so a resume stays epoch-consistent with the moments.
            save_full_state = (
                (checkpoint_count - 1) % state_every == 0 or epoch == cfg["max_epochs"] - 1
            )

            def _do_save(dev_state, dev_variables, meta=meta, full=save_full_state):
                # A failed WRITE (disk/fs-level OSError) must not kill a
                # multi-hour run: the previous checkpoint is still on disk
                # (atomic rename) and the next checkpoint retries. Backend
                # errors (dropped tunnel during the fetch) still propagate --
                # training itself is failing then and the babysitter's
                # restart+resume is the right response.
                try:
                    if full:
                        host_state = fetch.packed_device_get(dev_state)
                        checkpoints.save_weights(weights_fname, TS.variables_of(host_state), meta)
                        checkpoints.save_train_state(state_fname, host_state, metadata=meta)
                    else:
                        checkpoints.save_weights(
                            weights_fname, fetch.packed_device_get(dev_variables), meta
                        )
                    save_failures[0] = 0
                except OSError as e:
                    save_failures[0] += 1
                    if save_failures[0] >= 3:
                        logging.error(
                            "checkpoint save failed %d times in a row; the "
                            "checkpoint path is broken, aborting: %s",
                            save_failures[0],
                            e,
                        )
                        raise
                    logging.warning("checkpoint save failed (will retry next checkpoint): %s", e)

            if ckptr is not None:
                # The fetch+write runs on the checkpoint thread against the
                # immutable epoch-N device buffers while epoch N+1 trains;
                # over the slow device->host tunnel this hides minutes of
                # otherwise-idle TPU time per checkpoint.
                ckptr.submit(_do_save, state, variables)
            else:
                _do_save(state, variables)
            if valid_dataset is not None:
                from npe_tpu.training.evaluate import validation_pixel_accuracy
                from npe_tpu.training.quality import encoder_fid

                try:
                    ev = validation_pixel_accuracy(module, variables, valid_dataset, cfg, max_chunks=1)
                    # FID batch clamped to the validation set size so small sets
                    # still yield one chunk (evaluate.py handles the same case).
                    n_fid = min(256, valid_dataset.num_examples)
                    fid_bs = min(cfg["batch_size"], n_fid)
                    chunk = next(
                        iter(
                            data_loader(
                                {
                                    **cfg,
                                    "batch_size": fid_bs,
                                    "batches_per_chunk": max(1, n_fid // fid_bs),
                                },
                                valid_dataset,
                                offset=0,
                            )
                        ),
                        None,
                    )
                    if chunk is None:
                        ev["encoder_fid"] = float("nan")
                    else:
                        real = chunk.transpose(0, 2, 3, 1)
                        # The FIRST validation checkpoint freezes the feature
                        # space (quality.py: comparing FIDs from a drifting
                        # encoder conflates encoder movement with sample quality).
                        if fid_feature_vars is None:
                            # Packed fetch (one RPC per dtype, not per leaf)
                            # and saved for resume continuity.
                            fid_feature_vars = fetch.packed_device_get(variables)
                            checkpoints.save_weights(
                                fid_basis_fname, fid_feature_vars, {"epoch": epoch}
                            )
                        ev["encoder_fid"] = encoder_fid(
                            module,
                            variables,
                            real,
                            num=min(n_fid, len(real)),
                            seed=epoch,
                            feature_variables=fid_feature_vars,
                        )
                    logging.info(
                        "validation: pixel_acc=%.4f mse=%.4f encoder_fid=%.3f",
                        ev["test_error"],
                        ev["mse"],
                        ev["encoder_fid"],
                    )
                    mlog.log(epoch=epoch, itr=itr, validation=ev)
                except jax.errors.JaxRuntimeError as e:
                    # Same transient-backend rationale as the grid above:
                    # validation is an eval artifact, not training state;
                    # a dropped tunnel here killed a 250-epoch run once.
                    logging.warning("validation skipped (backend error): %s", e)

    if ckptr is not None:
        ckptr.close()
    logging.info("training done")
    return state


def main():
    p = argparse.ArgumentParser()
    p.add_argument("config_path", help="model config name or path (IAN, IANv1, IAN_simple)")
    # NOT type=bool: bool("False") is True, so any value would resume.
    # Accepts the reference's `--resume=True` spelling (`train_IAN.py:580`).
    p.add_argument(
        "--resume",
        type=lambda s: s.strip().lower() in ("1", "true", "yes"),
        default=False,
    )
    p.add_argument(
        "--dataset",
        default="synthetic",
        help="'synthetic', 'real', 'real:<dir>', path to .npz/.hdf5, or 'native:<raw>'",
    )
    p.add_argument("--valid-dataset", default=None, help="validation dataset spec")
    p.add_argument("--out-dir", default=".", help="where checkpoints/metrics are written")
    p.add_argument("--pics-dir", default="pics", help="where sample grids are written")
    p.add_argument("--max-epochs", type=int, default=None)
    p.add_argument("--num-examples", type=int, default=4096)
    p.add_argument("--data-parallel", action="store_true", help="shard over all devices")
    p.add_argument("--batch-size", type=int, default=None)
    p.add_argument("--batches-per-chunk", type=int, default=None)
    p.add_argument("--checkpoint-every", type=int, default=None)
    p.add_argument(
        "--compute-dtype",
        default=None,
        help="mixed-precision compute dtype for the train step (e.g. bfloat16); "
        "master weights and optimizer stay float32",
    )
    p.add_argument(
        "--moments-dtype",
        default=None,
        help="storage dtype for the Adam m/v moments (e.g. bfloat16); the "
        "update arithmetic stays float32. Off (float32 moments) for the "
        "faithful recipes; train states carrying low-precision moments are "
        "checkpoint format_version 1 (utils/checkpoints.py)",
    )
    p.add_argument(
        "--skip-nonfinite-updates",
        action="store_true",
        help="drop any step whose gradients contain inf/NaN instead of "
        "poisoning the parameters (docs/NUMERICS.md); off by default to "
        "keep the faithful recipes exactly the reference's semantics",
    )
    p.add_argument(
        "--adaptive-ratio-acc",
        type=float,
        default=None,
        help="D-saturation guard threshold (documented deviation, "
        "docs/PARITY.md): scheduled D steps train G instead while the "
        "on-device discriminator-accuracy EMA exceeds this value; off "
        "(faithful fixed alternation) by default",
    )
    p.add_argument(
        "--state-every",
        type=int,
        default=1,
        help="save the full optimizer state every Nth checkpoint (weights "
        "still save every checkpoint); resume restores from the last state save",
    )
    p.add_argument("--profile-dir", default=None, help="write a jax.profiler trace of the first chunk")
    p.add_argument(
        "--async-checkpoint",
        action="store_true",
        help="fetch+write checkpoints on a background thread so training "
        "continues through the slow device->host transfer (disables step "
        "buffer donation; saves stay ordered and atomic)",
    )
    p.add_argument(
        "--fid-feature-weights",
        default=None,
        help="checkpoint defining the frozen encoder-FID feature space "
        "(default: this run's first validation checkpoint)",
    )
    a = p.parse_args()
    overrides = {}
    if a.batch_size:
        overrides["batch_size"] = a.batch_size
    if a.batches_per_chunk:
        overrides["batches_per_chunk"] = a.batches_per_chunk
    if a.checkpoint_every:
        overrides["checkpoint_every_nth"] = a.checkpoint_every
    if a.compute_dtype:
        overrides["compute_dtype"] = a.compute_dtype
    if a.moments_dtype:
        overrides["moments_dtype"] = a.moments_dtype
    if a.skip_nonfinite_updates:
        overrides["skip_nonfinite_updates"] = True
    if a.adaptive_ratio_acc:
        overrides["adaptive_ratio_acc"] = a.adaptive_ratio_acc
    mesh = None
    if a.data_parallel:
        from npe_tpu.parallel.mesh import make_mesh

        mesh = make_mesh()
    train(
        config=a.config_path,
        dataset_spec=a.dataset,
        resume=a.resume,
        max_epochs=a.max_epochs,
        num_examples=a.num_examples,
        out_dir=a.out_dir,
        pics_dir=a.pics_dir,
        mesh=mesh,
        cfg_overrides=overrides,
        profile_dir=a.profile_dir,
        valid_dataset_spec=a.valid_dataset,
        fid_feature_weights=a.fid_feature_weights,
        state_every=a.state_every,
        async_checkpoint=a.async_checkpoint,
    )


if __name__ == "__main__":
    main()
