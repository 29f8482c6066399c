"""Training/eval orchestration (reference: pythia/trainers/base_trainer.py:26-489).

TPU-native loop design:
  * one jitted `train_step` (forward + loss + grad + optax update) with the
    batch sharded over the mesh `data` axis — XLA inserts the gradient
    all-reduce over ICI (replaces DataParallel/DDP+NCCL,
    base_trainer.py:51-137);
  * one jitted `eval_step` running the KV-cached greedy decode;
  * host-side: metering, logging cadence (log_interval probe +
    snapshot_interval full validation), early stopping, checkpointing,
    evalai prediction dumps — same cadence contract as the reference.
"""

from __future__ import annotations

import json
import os
import time
from typing import Any, Dict, Iterator, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from vitxtgqa_tpu.core.config import ConfigNode
from vitxtgqa_tpu.core.meter import Meter
from vitxtgqa_tpu.core.registry import registry
from vitxtgqa_tpu.data.dataset import collate
from vitxtgqa_tpu.data.loader import DataLoader, infinite_batches
from vitxtgqa_tpu.losses import Losses
from vitxtgqa_tpu.metrics.metrics import MetricContext, Metrics, decode_answers
from vitxtgqa_tpu.parallel.mesh import (
    batch_shardings,
    build_mesh,
    param_shardings,
    replicated,
)
from vitxtgqa_tpu.training.checkpoint import Checkpoint
from vitxtgqa_tpu.training.early_stopping import EarlyStopping
from vitxtgqa_tpu.training.optim import build_optimizer
from vitxtgqa_tpu.utils.logger import Logger
from vitxtgqa_tpu.utils.timer import Timer

DTYPES = {"float32": jnp.float32, "bfloat16": jnp.bfloat16, "float16": jnp.float16}


def build_model(model_key: str, model_cfg: Any, dataset_name: str,
                compute_dtype=jnp.float32, inference_only: bool = False):
    """Instantiate a registered model with registry-resolved head sizes
    (reference wiring: build_utils.py:38-51, vqa2/builder.py:40-48)."""
    cls = registry.get_model_class(model_key)
    num_final = registry.get(f"{dataset_name}_num_final_outputs")
    proc = registry.get(f"{dataset_name}_answer_processor")
    kwargs = {}
    if inference_only and "inference_only" in getattr(
        cls, "__dataclass_fields__", {}
    ):
        kwargs["inference_only"] = True
    return cls(
        config=model_cfg,
        num_final_outputs=int(num_final),
        # legacy image-VQA answer processors (vqa_answer/soft_copy_answer)
        # have no decode BOS; their models never decode, so any value works
        bos_idx=int(getattr(proc, "BOS_IDX", 2)),
        compute_dtype=compute_dtype,
        **kwargs,
    )


@registry.register_trainer("base_trainer")
class BaseTrainer:
    def __init__(self, config: ConfigNode):
        self.config = config
        self.tp = config.training_parameters
        self.run_type = getattr(self.tp, "run_type", "train+inference")
        self.profiler = Timer()

    # ------------------------------------------------------------------ load
    def load(self):
        tp = self.tp
        self.seed = int(getattr(tp, "seed", None) or 1)
        names = (
            self.config.datasets.split(",")
            if isinstance(self.config.datasets, str)
            else list(self.config.datasets)
        )
        self.dataset_names = [n.strip() for n in names if n.strip()]
        self.dataset_name = self.dataset_names[0]
        self.ds_cfg = self.config.dataset_attributes[self.dataset_name]

        save_dir = getattr(tp, "save_dir", "./save")
        if save_dir in ("./save", "save"):
            # default dir gets the reference's experiment slug
            # (ckpt_name_from_core_args, general.py:56-67)
            slug = f"{self.dataset_name}_{self.config.model}_{self.seed}"
            save_dir = os.path.join(save_dir, slug)
        self.logger = Logger(
            save_dir, level=getattr(tp, "logger_level", "info"),
            should_log=not getattr(tp, "should_not_log", False),
        )
        self.writer = self.logger
        registry.register("writer", self.logger)

        self._load_datasets()
        self._load_model()
        self._load_optimizer()
        self._load_extras(save_dir)

    def _load_datasets(self):
        builder = registry.get_builder_class(self.dataset_name)()
        tp = self.tp
        splits = set()
        if "train" in self.run_type:
            splits.update(["train", "val"])
        if "val" in self.run_type:
            splits.add("val")
        if "inference" in self.run_type or "test" in self.run_type:
            splits.add("test")
        if not splits:
            splits.add("val")

        self.datasets: Dict[str, Any] = {}
        self.loaders: Dict[str, DataLoader] = {}
        # multi-host: each process loads only its shard; the global batch
        # splits across hosts like the reference's per-rank batch
        # (reference: general.py:233-246, samplers.py:10-66)
        n_proc = jax.process_count()
        rank = jax.process_index()
        global_batch = int(tp.batch_size)
        if global_batch % max(n_proc, 1) != 0:
            raise ValueError(
                f"batch_size {global_batch} not divisible by "
                f"{n_proc} host processes"
            )
        batch_size = global_batch // max(n_proc, 1)
        workers = int(getattr(tp, "num_workers", 0) or 0)
        for split in sorted(splits):
            try:
                ds = builder.load(split, self.ds_cfg, seed=self.seed)
            except (FileNotFoundError, ValueError) as e:
                self.logger.write(f"split {split} unavailable: {e}", "warning")
                continue
            self.datasets[split] = ds
            collate_fn = collate
            if str(
                getattr(getattr(tp, "tpu", None), "compute_dtype", "bfloat16")
            ) == "bfloat16":
                import functools

                collate_fn = functools.partial(
                    collate,
                    cast={k: jnp.bfloat16 for k in self._BF16_FEATURE_KEYS},
                )
            self.loaders[split] = DataLoader(
                ds, batch_size=batch_size, shuffle=(split == "train"),
                seed=self.seed, drop_last=(split == "train"),
                pad_last=(split != "train"),
                num_workers=min(workers, 16),
                worker_mode=str(getattr(tp, "worker_mode", "process")),
                rank=rank, world_size=n_proc,
                collate_fn=collate_fn,
            )
        if not self.datasets:
            raise RuntimeError(
                f"no dataset splits could be loaded for {self.dataset_name!r} "
                f"(data_root_dir={self.ds_cfg.data_root_dir!r}); check paths"
            )

        # multi-dataset training: wrap per-dataset train loaders in the
        # deterministic-schedule MultiDataset (reference: multi_dataset.py)
        if len(self.dataset_names) > 1 and "train" in self.loaders:
            from vitxtgqa_tpu.data.multi_dataset import MultiDataset

            extra_loaders = {self.dataset_name: self.loaders["train"]}
            for name in self.dataset_names[1:]:
                cfg = self.config.dataset_attributes[name]
                b = registry.get_builder_class(name)()
                ds = b.load("train", cfg, seed=self.seed)
                extra_loaders[name] = DataLoader(
                    ds, batch_size=int(self.tp.batch_size), shuffle=True,
                    seed=self.seed, drop_last=True,
                )
            proportional = bool(
                getattr(self.tp, "dataset_size_proportional_sampling", True)
            )
            self.multi_train = MultiDataset(
                extra_loaders, proportional=proportional, seed=self.seed
            )
        else:
            self.multi_train = None

        primary = "train" if "train" in self.datasets else sorted(self.datasets)[0]
        self.primary_split = primary
        self.datasets[primary].update_registry_for_model()
        self.answer_processor = registry.get(f"{self.dataset_name}_answer_processor")

    def _load_model(self):
        tp = self.tp
        tpu_cfg = getattr(tp, "tpu", None)
        dtype_name = getattr(tpu_cfg, "compute_dtype", "float32") if tpu_cfg else "float32"
        self.compute_dtype = DTYPES.get(str(dtype_name), jnp.float32)

        model_key = self.config.model
        if model_key not in self.config.model_attributes:
            # ablation variants (t2s_wo_tg/t2s_wo_sg) share the t2s attribute
            # block: a lone model_attributes entry serves any --model
            if len(self.config.model_attributes) == 1:
                (only,) = list(self.config.model_attributes)
                self.logger.write(
                    f"model {model_key!r} using the {only!r} attribute block"
                )
                self.model_cfg = self.config.model_attributes[only]
            else:
                raise KeyError(
                    f"model {model_key!r} has no model_attributes entry in "
                    f"the config; available: "
                    f"{sorted(self.config.model_attributes)}"
                )
        else:
            self.model_cfg = self.config.model_attributes[model_key]
        # prediction-only runs take the serving path (skips the contrastive
        # variants; predictions are identical — losses just can't be logged)
        serving = bool(getattr(tp, "evalai_inference", False)) and (
            "train" not in self.run_type
        )
        self.model = build_model(
            model_key, self.model_cfg, self.dataset_name, self.compute_dtype,
            inference_only=serving,
        )
        if tpu_cfg is not None and getattr(tpu_cfg, "variant_scan", False):
            if "train_variant_scan" in getattr(
                type(self.model), "__dataclass_fields__", {}
            ):
                # flax modules are frozen dataclasses without .replace;
                # clone() is the linen way to rebind a field
                self.model = self.model.clone(train_variant_scan=True)
                self.logger.write("variant-scan training path enabled")
        if serving:
            self.logger.write("serving mode: single-variant inference path")

        if tpu_cfg is not None and getattr(tpu_cfg, "use_pallas", False):
            from vitxtgqa_tpu.ops.attention import set_use_pallas

            set_use_pallas(True)
            self.logger.write("fused Pallas attention enabled")
        # mode flags are process-wide globals: set them UNCONDITIONALLY
        # from this trainer's config so a previous in-process trainer/tool
        # cannot poison this one (same leak class as the round-3
        # reference_compat fix — see CLAUDE.md)
        from vitxtgqa_tpu.models.common import (
            set_fused_block_bwd,
            set_fused_decode,
            set_fused_grads,
            set_kv_cache_int8,
        )

        set_kv_cache_int8(
            bool(tpu_cfg is not None and getattr(tpu_cfg, "kv_cache_int8", False))
        )
        if tpu_cfg is not None and getattr(tpu_cfg, "kv_cache_int8", False):
            self.logger.write("int8 decode KV cache enabled")
        set_fused_decode(
            bool(tpu_cfg is None or getattr(tpu_cfg, "fused_decode", True))
        )
        if tpu_cfg is not None and not getattr(tpu_cfg, "fused_decode", True):
            self.logger.write(
                "fused decode-step kernel disabled (per-layer decode path)"
            )
        set_fused_grads(
            bool(tpu_cfg is not None and getattr(tpu_cfg, "fused_grads", False))
        )
        if tpu_cfg is not None and getattr(tpu_cfg, "fused_grads", False):
            self.logger.write(
                "fused dense grads enabled (bias grads as MXU dots — "
                "measured-negative default-off mode, see set_fused_grads)"
            )
        set_fused_block_bwd(
            bool(tpu_cfg is not None
                 and getattr(tpu_cfg, "fused_block_bwd", False))
        )
        if tpu_cfg is not None and getattr(tpu_cfg, "fused_block_bwd", False):
            self.logger.write(
                "fused-block backward kernel enabled (single-kernel "
                "block backward per layer, see set_fused_block_bwd)"
            )
        from vitxtgqa_tpu.ops.pallas_block_bwd import set_block_recompute_fwd

        set_block_recompute_fwd(
            bool(tpu_cfg is not None
                 and getattr(tpu_cfg, "fused_block_fwd", False))
        )
        if tpu_cfg is not None and getattr(tpu_cfg, "fused_block_fwd", False):
            self.logger.write(
                "Pallas block recompute-forward enabled "
                "(see set_block_recompute_fwd)"
            )
        from vitxtgqa_tpu.ops.pallas_block_bwd import set_kernel_dropout

        set_kernel_dropout(
            bool(tpu_cfg is not None
                 and getattr(tpu_cfg, "kernel_dropout", False))
        )
        if tpu_cfg is not None and getattr(tpu_cfg, "kernel_dropout", False):
            self.logger.write(
                "in-kernel PRNG dropout masks enabled for the fused block "
                "(see set_kernel_dropout)"
            )
        # unconditional like the flags above: a prior in-process tool that
        # raises the cap (e.g. tools/ab_fused_decode.py) must not poison
        # this trainer's decode-path choice
        from vitxtgqa_tpu.models.common import (
            DEFAULT_FUSED_DECODE_MAX_BATCH,
            set_fused_decode_max_batch,
        )

        set_fused_decode_max_batch(
            int(getattr(tpu_cfg, "fused_decode_max_batch",
                        DEFAULT_FUSED_DECODE_MAX_BATCH))
            if tpu_cfg is not None else DEFAULT_FUSED_DECODE_MAX_BATCH
        )
        from vitxtgqa_tpu.models.common import (
            set_compact_serving,
            set_compact_train,
        )

        set_compact_train(
            getattr(tpu_cfg, "compact_train", False)
            if tpu_cfg is not None else False
        )
        if tpu_cfg is not None and getattr(tpu_cfg, "compact_train", False):
            self.logger.write(
                "EXPERIMENTAL compact training enabled (pos/neg variants "
                "on grounding-kept rows — estimator deviation, see "
                "set_compact_train)"
            )
        set_compact_serving(
            bool(tpu_cfg is not None
                 and getattr(tpu_cfg, "compact_serving", False))
        )
        if tpu_cfg is not None and getattr(tpu_cfg, "compact_serving", False):
            self.logger.write(
                "grounding-compacted serving enabled (inference_only "
                "decode runs on the grounding-kept rows; documented "
                "ptr-score deviation — see set_compact_serving)"
            )
        from vitxtgqa_tpu.ops.attention import set_w8a8

        set_w8a8(
            bool(tpu_cfg is not None and getattr(tpu_cfg, "w8a8", False))
        )
        if tpu_cfg is not None and getattr(tpu_cfg, "w8a8", False):
            self.logger.write(
                "W8A8 int8 fused blocks enabled (experimental serving "
                "mode — validate metrics against a bf16 run)"
            )
        from vitxtgqa_tpu.metrics.evaluators import set_reference_compat

        # set unconditionally: the flag is a process-wide global, and a
        # prior trainer in the same process (e.g. tools/checkpoint_parity)
        # may have left it on — a leaked True silently reverts the metric
        # bug fixes (gt_box frame/box pairing, IoU duplicate-append) for
        # every later eval
        set_reference_compat(bool(getattr(tp, "reference_compat", False)))
        if getattr(tp, "reference_compat", False):
            self.logger.write(
                "reference_compat: metric deviations reverted to "
                "reference-exact (bug-for-bug) semantics"
            )
        if tpu_cfg is not None and getattr(tpu_cfg, "debug_nans", False):
            jax.config.update("jax_debug_nans", True)
            self.logger.write("jax_debug_nans enabled")
        remat_mode = str(getattr(tpu_cfg, "remat", "none")) if tpu_cfg else "none"
        if remat_mode not in ("none", "None", "false", "False"):
            from vitxtgqa_tpu.models.common import set_remat

            set_remat(remat_mode)
            self.logger.write(
                f"transformer-layer rematerialisation enabled ({remat_mode})"
            )

        mesh_cfg = getattr(tpu_cfg, "mesh", None) if tpu_cfg else None
        data_ax = int(getattr(mesh_cfg, "data", -1)) if mesh_cfg else -1
        model_ax = int(getattr(mesh_cfg, "model", 1)) if mesh_cfg else 1
        sp_ax = int(getattr(mesh_cfg, "sp", 1)) if mesh_cfg else 1
        pp_ax = int(getattr(mesh_cfg, "pp", 1)) if mesh_cfg else 1
        self.mesh = build_mesh(
            data=data_ax, model=model_ax, sp=sp_ax, pp=pp_ax,
            batch_size=int(tp.batch_size),
        )
        # Pallas kernels under plain GSPMD jit REPLICATE: XLA has no
        # partitioning rule for pallas_call, so a dp/tp/pp-sharded step
        # all-gathers the kernel inputs and runs the full-batch kernel on
        # every device (measured in a round-5 probe: sharded input in,
        # PartitionSpec() out) — silently destroying data-parallel
        # scaling.  Until the hot kernels are shard_map-wrapped over the
        # data axis (ROADMAP), multi-device batch/model/pipeline meshes
        # fall back to the sharded XLA paths; sp-only meshes keep Pallas
        # (sequence parallelism already routes attention through its own
        # shard_map).  int8 KV goes with it: without the decode kernel
        # the int8 cache pays a per-step dequantize pass.
        spmd_devs = (
            dict(self.mesh.shape).get("data", 1)
            * dict(self.mesh.shape).get("model", 1)
            * dict(self.mesh.shape).get("pp", 1)
        )
        if spmd_devs > 1:
            from vitxtgqa_tpu.ops.attention import (
                pallas_enabled,
                set_use_pallas,
            )

            if pallas_enabled():
                set_use_pallas(False)
                set_kv_cache_int8(False)
                self.logger.write(
                    f"Pallas kernels disabled on the {spmd_devs}-device "
                    "dp x tp x pp mesh (pallas_call replicates under "
                    "GSPMD; XLA paths shard correctly — see ROADMAP "
                    "shard_map-wrapping candidate)"
                )
        if sp_ax > 1:
            from vitxtgqa_tpu.ops.attention import set_sequence_parallel

            set_sequence_parallel(self.mesh, "sp")
            self.logger.write(
                f"sequence parallelism over {sp_ax} shards enabled"
            )
        if pp_ax > 1:
            from vitxtgqa_tpu.models.common import set_pipeline

            set_pipeline(
                self.mesh, "pp",
                int(getattr(tpu_cfg, "pp_microbatches", 0)),
            )
            self.logger.write(
                f"GPipe pipeline over {pp_ax} stages enabled (stacks whose "
                "layer count divides the stage count)"
            )
        self.logger.write(f"mesh: {dict(self.mesh.shape)}")

        example = next(iter(self.loaders[self.primary_split]))
        self.example_tensors = example["tensors"]
        rng = jax.random.key(self.seed)
        k_p, k_d, k_g = jax.random.split(rng, 3)
        variables = self.model.init(
            {"params": k_p, "dropout": k_d, "gumbel": k_g},
            self.example_tensors, train=True,
        )
        self.params = variables["params"]
        n_params = sum(x.size for x in jax.tree_util.tree_leaves(self.params))
        self.logger.write(f"model {model_key}: {n_params/1e6:.1f}M params")

        self.param_sharding = param_shardings(self.params, self.mesh)
        self.params = jax.device_put(self.params, self.param_sharding)

        self.losses = Losses(
            list(getattr(self.model_cfg, "losses", []) or []), self.dataset_name
        )
        self.metrics = Metrics(
            list(getattr(self.model_cfg, "metrics", []) or []), self.dataset_name
        )

    def _load_optimizer(self):
        from vitxtgqa_tpu.training.optim import (
            assert_scales_resolve,
            module_lr_scales,
        )

        assert_scales_resolve(module_lr_scales(self.model_cfg), self.params)
        self.tx, self.lr_schedule = build_optimizer(
            self.config.optimizer_attributes, self.tp, self.model_cfg
        )
        self.opt_state = jax.jit(
            self.tx.init, out_shardings=replicated(self.mesh)
        )(self.params)
        self._build_steps()

    def _build_steps(self):
        model, losses, tx = self.model, self.losses, self.tx
        mesh = self.mesh
        data_sharding = jax.sharding.NamedSharding(
            mesh, jax.sharding.PartitionSpec("data")
        )

        def train_step(params, opt_state, tensors, rng, step):
            k_d, k_g = jax.random.split(jax.random.fold_in(rng, step))

            def loss_fn(p):
                out = model.apply(
                    {"params": p}, tensors, train=True,
                    rngs={"dropout": k_d, "gumbel": k_g},
                )
                total, ldict = losses.total(tensors, out)
                return total, (ldict, out)

            (total, (ldict, out)), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(params)
            gnorm = optax.global_norm(grads)
            # NaN tripwire (the TPU stand-in for the reference's always-on
            # torch anomaly detection, base_trainer.py:214): a non-finite
            # loss/grad skips the update instead of corrupting the params
            ok = jnp.isfinite(total) & jnp.isfinite(gnorm)
            updates, new_opt_state = tx.update(grads, opt_state, params)
            new_params = optax.apply_updates(params, updates)
            params = jax.tree_util.tree_map(
                lambda new, old: jnp.where(ok, new, old), new_params, params
            )
            opt_state = jax.tree_util.tree_map(
                lambda new, old: jnp.where(ok, new, old)
                if hasattr(new, "shape") else new,
                new_opt_state, opt_state,
            )
            return params, opt_state, total, ldict, out, gnorm

        def eval_step(params, tensors, rng, step):
            k_g = jax.random.fold_in(rng, step)
            return model.apply(
                {"params": params}, tensors, train=False, rngs={"gumbel": k_g}
            )

        self.train_step = jax.jit(train_step, donate_argnums=(0, 1))
        self.eval_step = jax.jit(eval_step)
        self._data_sharding = data_sharding

    def _load_extras(self, save_dir: str):
        tp = self.tp
        tpu_cfg = getattr(tp, "tpu", None)
        async_ckpt = bool(
            getattr(tpu_cfg, "async_checkpoint", True)
        ) if tpu_cfg is not None else True
        self.checkpoint = Checkpoint(
            save_dir, self.config, async_save=async_ckpt
        )
        self.meter = Meter()
        self.early_stopping = EarlyStopping(
            monitored_metric=getattr(tp, "monitored_metric", "total_loss"),
            patience=int(getattr(tp, "patience", 4000)),
            minimize=bool(getattr(tp, "metric_minimize", True)),
            should_stop=bool(getattr(tp, "should_early_stop", False)),
        )
        self.iteration = 0
        self.current_epoch = 0
        self.max_iterations = int(getattr(tp, "max_iterations", 10000))
        self.log_interval = int(getattr(tp, "log_interval", 100))
        self.snapshot_interval = int(getattr(tp, "snapshot_interval", 1000))
        self.rng = jax.random.key(self.seed + 7)

        resume_file = getattr(tp, "resume_file", None)
        if resume_file:
            self._restore(resume_file)
        elif getattr(tp, "resume", False):
            best = self.checkpoint.best_path
            if os.path.exists(best):
                self._restore(best)

        self.metric_contexts = {
            split: MetricContext.from_config(self.ds_cfg, split, self.answer_processor)
            for split in self.datasets
        }

    def _restore(self, path: str):
        template = {"params": self.params, "opt_state": self.opt_state}
        # restore each array directly onto its mesh shards (orbax reads only
        # the slice each host owns — the multi-host resume path; also skips
        # the full-size host copy + device_put the naive restore pays)
        rep = replicated(self.mesh)
        shardings = {
            "params": self.param_sharding,
            "opt_state": jax.tree_util.tree_map(lambda _: rep, self.opt_state),
        }
        state = self.checkpoint.load(path, template=template,
                                     shardings=shardings)
        self.params = state["params"]
        self.opt_state = state["opt_state"]
        meta = self.checkpoint.load_meta(path)
        self.iteration = int(meta["iteration"])
        # resume the epoch-seeded data shuffle where the run left off
        # (reference: checkpoint.py:131-136 restores current_epoch,
        # base_trainer.py:216-223 re-seeds the sampler with it)
        self.current_epoch = int(meta.get("epoch", 0))
        # continue the early-stopping patience window (reference:
        # early_stopping.py:87-92 via checkpoint.py:126)
        self.early_stopping.init_from_meta(meta)
        self.logger.write(
            f"restored checkpoint {path} @ iteration {self.iteration} "
            f"(epoch {self.current_epoch})"
        )

    # ------------------------------------------------------------------ train
    # large float feature fields whose first on-device op is .astype(bf16)
    # in every model's _encode_modalities: pre-casting on the host is
    # bit-identical and halves their H2D bytes (~4GB/step at batch 576)
    _BF16_FEATURE_KEYS = (
        "video_feat", "mid_img_feat", "context_feature_0",
        "context_feature_1", "ocr_bbox_coordinates",
    )

    def _put_batch(self, tensors):
        if self.compute_dtype == jnp.bfloat16:
            tensors = dict(tensors)
            for key in self._BF16_FEATURE_KEYS:
                # usually already bf16 (fused into collate); the astype
                # only fires for batches from non-trainer-built loaders
                if key in tensors and tensors[key].dtype != jnp.bfloat16:
                    tensors[key] = tensors[key].astype(jnp.bfloat16)
        return jax.device_put(tensors, self._data_sharding)

    def _prefetched(self, it):
        """Wrap a batch iterator with background H2D prefetch when
        training_parameters.tpu.prefetch > 0 (keeps the numpy tensors
        under "tensors_host" for host-side scoring)."""
        depth = int(getattr(getattr(self.tp, "tpu", None), "prefetch", 0) or 0)
        if depth <= 0:
            return it
        from vitxtgqa_tpu.data.loader import prefetch_batches

        return prefetch_batches(
            it, size=depth, device_put=self._put_batch, keep_host=True
        )

    def _split_device_batch(self, batch):
        """(device tensors, host-view batch) for a possibly-prefetched
        batch: device_puts on the spot when prefetch is off."""
        if "tensors_host" in batch:
            dev = batch["tensors"]
            batch = dict(batch)
            batch["tensors"] = batch.pop("tensors_host")
            return dev, batch
        return self._put_batch(batch["tensors"]), batch

    def train(self):
        if "train" not in self.run_type:
            self.inference()
            return

        self.logger.write(
            f"training {self.config.model} for {self.max_iterations} iterations"
        )
        should_stop = False
        def _track_epoch(epoch: int):
            self.current_epoch = epoch

        batches = (
            self.multi_train.iter_from(self.iteration)
            if self.multi_train is not None
            else infinite_batches(
                self.loaders["train"],
                start_epoch=self.current_epoch,
                epoch_cb=_track_epoch,
            )
        )
        train_timer = Timer()
        debug = getattr(self.tp, "logger_level", "info") == "debug"
        tpu_cfg = getattr(self.tp, "tpu", None)
        # host->device prefetch (config: training_parameters.tpu.prefetch):
        # a background thread assembles + device_puts the next batches
        # while the device computes, so host IO and H2D never serialize
        # with the train step
        batches = self._prefetched(batches)
        profile_steps = int(getattr(tpu_cfg, "profile_steps", 0) or 0)
        profile_dir = getattr(tpu_cfg, "profile_dir", None) or os.path.join(
            self.logger.save_dir, "profile"
        )
        profiling = False
        while self.iteration < self.max_iterations and not should_stop:
            phase_timer = Timer() if debug else None
            batch = next(batches)
            self.iteration += 1
            if debug:
                self.logger.write(
                    f"Batch load time: {phase_timer.get_time_since_start():.1f}ms",
                    "debug",
                )
                phase_timer.reset()
            # jax.profiler trace window (SURVEY §5.1 TPU equivalent of the
            # reference's Timer-based phase profiling)
            if profile_steps and self.iteration == 3 and not profiling:
                jax.profiler.start_trace(profile_dir)
                profiling = True
            if profiling and self.iteration == 3 + profile_steps:
                jax.profiler.stop_trace()
                profiling = False
                self.logger.write(f"profiler trace written to {profile_dir}")
            tensors, batch = self._split_device_batch(batch)
            (
                self.params, self.opt_state, total, ldict, out, gnorm
            ) = self.train_step(
                self.params, self.opt_state, tensors, self.rng, self.iteration
            )
            if debug:
                jax.block_until_ready(total)
                self.logger.write(
                    f"Step time: {phase_timer.get_time_since_start():.1f}ms",
                    "debug",
                )

            if self.iteration % self.log_interval == 0:
                update = {f"train/{k}": float(v) for k, v in ldict.items()}
                update["train/total_loss"] = float(total)
                update["train/grad_norm"] = float(gnorm)
                out_np = jax.device_get(out)
                train_metrics = self.metrics(
                    batch["tensors"], out_np, batch["host"],
                    self.metric_contexts.get("train")
                    or MetricContext(self.answer_processor),
                    train=True,
                )
                update.update({f"train/{k}": v for k, v in train_metrics.items()})
                self.meter.update(update)
                lr = float(self.lr_schedule(self.iteration))
                elapsed = train_timer.get_time_since_start()
                ups = self.log_interval / max(elapsed / 1000.0, 1e-9)
                train_timer.reset()
                # ETA from the current log-interval rate
                # (reference: base_trainer.py:453-463)
                remaining_ms = (self.max_iterations - self.iteration) / max(
                    ups, 1e-9
                ) * 1000.0
                eta = Timer().get_time_hhmmss(remaining_ms)
                self.logger.write(
                    f"it {self.iteration}/{self.max_iterations} "
                    f"lr={lr:.2e} {ups:.2f} it/s eta={eta} | "
                    f"{self.meter.get_log_string()}"
                )
                self.logger.add_scalars(update, self.iteration)
                self._val_probe()

            if self.iteration % self.snapshot_interval == 0:
                should_stop = self._snapshot()

        self.finalize()

    def _val_probe(self):
        """1-batch validation estimate at log cadence
        (reference: base_trainer.py:347-357).

        Draws successive batches from a persistent cycling iterator like
        the reference does — a fresh `iter()` each call with shuffle off
        would score val batch 0 every probe and bias the smoothed val/*
        meter entries to one batch."""
        if "val" not in self.loaders:
            return
        it = getattr(self, "_val_probe_iter", None)
        if it is None:
            it = iter(self.loaders["val"])
            self._val_probe_iter = it
        try:
            batch = next(it)
        except StopIteration:
            self._val_probe_iter = it = iter(self.loaders["val"])
            batch = next(it)
        tensors = self._put_batch(batch["tensors"])
        out = self.eval_step(self.params, tensors, self.rng, self.iteration)
        _, ldict = self.losses.total(batch["tensors"], jax.device_get(out))
        probe = {f"val/{k}": float(v) for k, v in ldict.items()}
        self.meter.update(probe)
        self.logger.add_scalars(probe, self.iteration)

    def _snapshot(self) -> bool:
        """Full validation + early stopping + checkpoint
        (reference: base_trainer.py:363-392).  Returns True to stop."""
        if getattr(self.tp, "log_histograms", False):
            # per-parameter histogram channel (reference logger capability,
            # logger.py:133-141; opt-in here — it reads every param to host)
            self.logger.add_histograms_for_params(
                jax.device_get(self.params), self.iteration
            )
        if "val" not in self.loaders:
            self.checkpoint.save(
                self._state(), self.iteration, update_best=True,
                best_iteration=self.iteration, epoch=self.current_epoch,
            )
            return False
        loss_avg, metric_avg = self.evaluate("val")
        combined = {f"val/{k}": v for k, v in {**loss_avg, **metric_avg}.items()}
        self.meter.update(combined)
        self.logger.add_scalars(combined, self.iteration)
        self.logger.write(
            f"validation @ {self.iteration}: "
            + ", ".join(f"{k}={v:.4f}" for k, v in combined.items())
        )

        monitored = self.early_stopping.monitored_metric
        value = combined.get(
            f"val/{monitored}",
            loss_avg.get("total_loss", 0.0),
        )
        is_best = self.early_stopping.is_best(value)
        stop = self.early_stopping(value, self.iteration)
        self.checkpoint.save(
            self._state(), self.iteration, update_best=is_best,
            best_iteration=self.early_stopping.best_iteration,
            best_metric_value=self.early_stopping.best_value,
            epoch=self.current_epoch,
        )
        return stop

    def _state(self):
        # the iteration counter rides in meta.json, not the array tree
        return {"params": self.params, "opt_state": self.opt_state}

    # ------------------------------------------------------------------ eval
    @staticmethod
    def _trim_padding(batch, out_np):
        """Drop padded eval rows (loader pad_last) before host-side scoring."""
        n = batch["host"].get("n_valid")
        tensors, host = batch["tensors"], batch["host"]
        if n is None or n == next(iter(tensors.values())).shape[0]:
            return tensors, out_np, host
        tensors = {k: v[:n] for k, v in tensors.items()}
        out_np = {
            k: (v[:n] if getattr(v, "ndim", 0) >= 1 and v.shape[:1] != () else v)
            for k, v in out_np.items()
        }
        host = {
            k: (v[:n] if isinstance(v, list) else v) for k, v in host.items()
        }
        return tensors, out_np, host

    def evaluate(self, split: str):
        """Full-split evaluation: losses + configured metrics
        (reference: base_trainer.py:394-410)."""
        loader = self.loaders[split]
        ctx = self.metric_contexts[split]
        loss_sums: Dict[str, float] = {}
        metric_sums: Dict[str, float] = {}
        n_batches = 0

        def dispatched():
            # dispatch the next batch's eval before pulling the previous
            # one's results: device compute overlaps host-side scoring;
            # prefetch_batches additionally overlaps batch assembly + H2D
            # with both (training_parameters.tpu.prefetch)
            pending = None
            for i, batch in enumerate(self._prefetched(iter(loader))):
                dev, batch = self._split_device_batch(batch)
                out = self.eval_step(self.params, dev, self.rng, i)
                if pending is not None:
                    yield pending
                pending = (batch, out)
            if pending is not None:
                yield pending

        for batch, out in dispatched():
            out_np = jax.device_get(out)
            tensors, out_np, host = self._trim_padding(batch, out_np)
            total, ldict = self.losses.total(tensors, out_np)
            loss_sums["total_loss"] = loss_sums.get("total_loss", 0.0) + float(total)
            for k, v in ldict.items():
                loss_sums[k] = loss_sums.get(k, 0.0) + float(v)
            for k, v in self.metrics(
                tensors, out_np, host, ctx, train=False
            ).items():
                metric_sums[k] = metric_sums.get(k, 0.0) + float(v)
            n_batches += 1
        if n_batches == 0:
            return {}, {}
        return (
            {k: v / n_batches for k, v in loss_sums.items()},
            {k: v / n_batches for k, v in metric_sums.items()},
        )

    def inference(self):
        for split in ("val", "test"):
            if split not in self.loaders:
                continue
            if split == "val" and "val" not in self.run_type and "inference" not in self.run_type:
                continue
            self.logger.write(f"=== inference on {split} ===")
            if getattr(self.tp, "evalai_inference", False):
                self.predict_for_evalai(split)
                continue
            loss_avg, metric_avg = self.evaluate(split)
            report = {**loss_avg, **metric_avg}
            self.logger.write(
                f"{split}: " + ", ".join(f"{k}={v:.4f}" for k, v in report.items())
            )
            self.logger.add_scalars(
                {f"{split}/{k}": v for k, v in report.items()}, self.iteration
            )

    def predict_for_evalai(self, split: str):
        """Prediction JSON dump (reference: test_reporter.py:17-149,
        vtextgqa/dataset.py:315-363)."""
        loader = self.loaders[split]
        ds = self.datasets[split]
        predictions = []
        for bi, batch in enumerate(self._prefetched(iter(loader))):
            dev, batch = self._split_device_batch(batch)
            out = jax.device_get(
                self.eval_step(self.params, dev, self.rng, bi)
            )
            tensors, out, host = self._trim_padding(batch, out)
            if "pos_scores" not in out and hasattr(ds, "format_for_evalai"):
                # legacy image-VQA datasets format their own records
                # (reference: test_reporter.py:126-134 delegates to
                # dataset.format_for_evalai; vqa2/dataset.py:180-206)
                predictions.extend(ds.format_for_evalai(tensors, out, host))
                continue
            pred_inds = np.asarray(out["pos_scores"]).argmax(-1)
            answers = decode_answers(
                pred_inds, host["context_tokens"], self.answer_processor
            )
            vocab_size = self.answer_processor.get_true_vocab_size()
            frames = np.asarray(out["ground_frame"]).tolist()
            boxes = np.asarray(out["ground_box"]).tolist()
            qids = np.asarray(tensors["question_id"]).tolist()
            for i, qid in enumerate(qids):
                sources = []
                for idx in pred_inds[i].tolist():
                    if idx >= vocab_size:
                        sources.append("OCR")
                    else:
                        if idx == self.answer_processor.EOS_IDX:
                            break
                        sources.append("VOCAB")
                predictions.append(
                    {
                        "question_id": qid,
                        "video_id": host["image_id"][i],
                        "answer": answers[i],
                        "grounded frame": frames[i],
                        "grounded box": boxes[i],
                        "pred_source": sources,
                    }
                )
        # multihost eval: gather every process's predictions on each host
        # (reference: test_reporter.py:135-142 gather across ranks)
        if jax.process_count() > 1:
            from vitxtgqa_tpu.parallel.collectives import gather_objects

            predictions = [
                p for chunk in gather_objects(predictions) for p in chunk
            ]
            if jax.process_index() != 0:
                return None

        report_dir = os.path.join(self.logger.save_dir, "reports")
        os.makedirs(report_dir, exist_ok=True)
        path = os.path.join(
            report_dir,
            f"{self.dataset_name}_{split}_{time.strftime('%Y%m%dT%H%M%S')}.json",
        )
        with open(path, "w") as f:
            json.dump(predictions, f)
        self.logger.write(f"wrote {len(predictions)} predictions to {path}")
        return path

    def finalize(self):
        """Forced final validation, restore best, test inference
        (reference: base_trainer.py:280-291)."""
        if "train" in self.run_type:
            self._snapshot()
            self.checkpoint.finalize(
                self._state(), self.iteration, epoch=self.current_epoch
            )
            best = self.checkpoint.best_path
            if os.path.exists(best):
                self._restore(best)
        if "inference" in self.run_type or "predict" in self.run_type:
            self.inference()
