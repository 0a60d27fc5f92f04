"""Trainer: the Lightning-harness equivalent, single-controller JAX.

Covers the reference's L5/L6 behavior (SURVEY.md §2a rows 14-18):
- DataModule graph prep (canonicalize, normalized_edata, splits, sampler
  factory — train_lightning.py:307-394)
- per-step training with EMA'd sampled node/edge counters, iter/fwd-bwd
  timers, train micro-F1 (train_lightning.py:100-177)
- sampled validation each epoch (val_acc/val_loss, :179-203)
- Adam + StepLR(0.01, 5 epochs) (:205-216)
- ModelCheckpoint(best val_acc) + EarlyStopping(stopping_threshold=
  --val-acc-target, patience) (:620-657) — checkpoint includes the EXP3
  state and PRNG key (unlike the reference, SURVEY.md §5.4)
- vertex-limit adaptive batch-size controller (BatchSizeCallback :425-486)
- post-fit full-graph layerwise inference + Final Accuracy (:686-705)
"""
from __future__ import annotations

import dataclasses
import math
import os
import time
import warnings
from typing import Dict, List, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from bliss_gnn_tpu.graph.datasets import load_dataset
from bliss_gnn_tpu.graph.structure import DeviceGraph, Graph, normalized_edata
from bliss_gnn_tpu.models.gnn import build_model
from bliss_gnn_tpu.models.inference import layerwise_inference
from bliss_gnn_tpu.sampling.block import CapacityPlan
from bliss_gnn_tpu.sampling.samplers import (
    SamplerConfig,
    init_exp3_weights,
    normalize_exp3_weights,
    sample_blocks,
)
from bliss_gnn_tpu.train.metrics import (
    EmaCounter,
    F1State,
    Welford,
    f1_compute,
    f1_update,
)
from bliss_gnn_tpu.train.steps import (
    TrainState,
    make_eval_step,
    make_optimizer,
    make_train_step,
)
from bliss_gnn_tpu.utils.logging import (
    MetricLogger,
    enable_compilation_cache,
    next_version_dir,
)


@dataclasses.dataclass
class TrainConfig:
    """The CLI flag surface (train_lightning.py:489-552) plus the constants
    the reference buries in code (SURVEY.md §5.6), surfaced as knobs."""

    dataset: str = "cora"
    model: str = "sage"
    sampler: str = "poisson-bandit"
    fan_out: Tuple[int, ...] = (16384, 8192, 4096)
    batch_size: int = 1024
    num_hidden: int = 256
    num_layers: int = 3
    lr: float = 0.002
    dropout: float = 0.1
    eta: float = 0.1
    importance_sampling: bool = True
    num_epochs: int = -1
    num_steps: int = -1
    min_steps: int = 0
    num_in_heads: int = 4
    num_out_heads: int = 1
    attn_dropout: float = 0.1
    negative_slope: float = 0.2
    residual: bool = False
    undirected: bool = False
    val_acc_target: float = 1.0
    early_stopping_patience: int = 1000
    disable_checkpoint: bool = False
    logdir: str = "tb_logs"
    vertex_limit: int = -1
    seed: int = 0
    # surfaced constants
    ema_w: float = 0.99
    exp3_delta: float = 0.01
    # use the paper's per-dst delta formula instead of the constant (the
    # formula is commented out in the reference, bandit_sampler.py:226-233;
    # T = num_steps when positive, else the sampler default 5000)
    exp3_delta_formula: bool = False
    # the fused step defers the EXP3 L1 row normalization (consumers
    # renormalize per dst; see samplers.apply_exp3_deltas) — renormalize
    # the state every this many steps for bf16 hygiene.  1 reproduces the
    # reference's normalize-every-step exactly.
    exp3_renorm_every: int = 64
    poisson_eps: float = 0.9999
    lr_gamma: float = 0.01
    lr_step_size: int = 5
    # capacity knobs (TPU-specific, no reference counterpart)
    frontier_slack: float = 8.0
    block_edge_slack: float = 4.0
    max_frontier_edges: Optional[int] = None
    # capacity refit: after this many measured steps, tighten the static
    # frontier/kept-edge capacities to measured-maxima * refit slack and
    # re-jit (CapacityPlan.refit).  The a-priori caps must cover the worst
    # case cold; measured, they run ~an order of magnitude above the true
    # counts on large-fanout configs — and every per-edge op in the sampler
    # AND the model scales with the cap.  0 disables.  Post-refit overflow
    # widens the plan back out (CapacityPlan.widen).
    refit_after: int = 3
    refit_block_edge_slack: float = 1.6
    refit_frontier_slack: float = 1.25
    # numerics
    param_dtype: str = "float32"
    compute_dtype: str = "bfloat16"
    exp3_dtype: str = "bfloat16"
    # observability: capture a jax.profiler trace of steps [2, 2+profile_steps)
    profile_steps: int = 0
    resume: str = ""  # checkpoint dir to restore before training (restart-from-step)
    # UVA analog: keep features in host RAM behind an HBM cache
    # (graph/featurecache.py; train_lightning.py:376-380,:394)
    use_uva: bool = False
    cache_size: int = 0  # cached rows; 0 -> min(n_nodes, 2**21)
    # chain K fused steps in one lax.scan dispatch (steps.py:
    # make_multi_train_step) — amortizes per-step dispatch latency
    steps_per_call: int = 1
    # chain K sampled-validation batches per dispatch (eval analog of the
    # scan chain; ~33 ms dispatch latency per val batch otherwise).  The
    # chained sums equal the per-batch loop exactly.  1 disables; UVA runs
    # always unchained (host feature gather per batch).
    eval_steps_per_call: int = 8
    # 'auto' uses the banded Pallas SpMM for SAGE/GCN final eval on TPU when
    # the graph is large; 'xla' forces the chunked segment-sum path
    inference_backend: str = "auto"
    # data parallelism over a device mesh: 1 = single device (reference
    # behavior); N > 1 = shard the seed batch over N devices (psum'd grads,
    # all-gathered EXP3 deltas — parallel/dp.py); 0 = all visible devices.
    # Multi-host pods initialize via parallel/multihost.py (env-driven).
    dp: int = 1
    # edge-partitioned storage (parallel/shardedstep.py): shard the graph,
    # feature matrix, and EXP3 state into contiguous ranges over the dp
    # mesh — O(E/S + N/S) per device, for graphs beyond one HBM.  Sampled
    # training is numerically equivalent to the replicated-DP path (tested);
    # requires dp != 1.
    shard_graph: bool = False
    # also shard the [N+1] csc_indptr by the same node ranges (served via
    # the NShard distributed gather) — ~450 MB/device replicated at
    # papers100M.  Auto: on for graphs over ~32M nodes under --shard-graph.
    shard_indptr: Optional[bool] = None

    @property
    def run_name(self) -> str:
        """Structured run name (train_lightning.py:636-646)."""
        return (
            f"paper_{self.model}_{self.dataset}_{self.sampler}_"
            f"{int(self.importance_sampling)}_steps_{self.num_steps}_bs_"
            f"{self.batch_size}_layers_{self.num_layers}_lr_{self.lr}_"
            f"eta_{self.eta}"
        )


def _device_graph_struct(g: Graph, feature_dtype) -> DeviceGraph:
    """A DeviceGraph of ShapeDtypeStructs mirroring Graph.to_device without
    uploading anything — lets parameter-shape tracing (jax.eval_shape) run
    when the real graph lives only as mesh shards (--shard-graph)."""
    from bliss_gnn_tpu.sampling.frontier import EDGE_PAD

    sds = jax.ShapeDtypeStruct
    canon = jax.dtypes.canonicalize_dtype
    e_pad = g.n_edges + EDGE_PAD
    nd = {}
    for k, v in g.ndata.items():
        v = np.asarray(v)
        nd[k] = sds(v.shape, feature_dtype if k == "features"
                    else canon(v.dtype))
    ed = {
        k: sds((e_pad,) + np.asarray(v).shape[1:],
               canon(np.asarray(v).dtype))
        for k, v in g.edata.items()
    }
    return DeviceGraph(
        csc_indptr=sds((g.n_nodes + 1,), jnp.int32),
        csc_src=sds((e_pad,), jnp.int32),
        csr_indptr=sds((g.n_nodes + 1,), jnp.int32),
        csr_dst=sds((g.n_edges,), jnp.int32),
        csr_eid=sds((g.n_edges,), jnp.int32),
        ndata=nd, edata=ed, n_nodes=g.n_nodes, n_edges=g.n_edges,
    )


class Trainer:
    def __init__(self, cfg: TrainConfig, graph: Optional[Graph] = None,
                 n_classes: Optional[int] = None,
                 multilabel: Optional[bool] = None):
        self.cfg = cfg
        enable_compilation_cache()
        # -- device mesh (data parallelism) -------------------------------
        # dp == 1 reproduces the reference's single-device harness; dp != 1
        # builds a dp-axis mesh and routes every step through parallel/dp.py
        # (multi-host pods first join via jax.distributed — a no-op when
        # single-process, so this is safe to run unconditionally).
        self.mesh = None
        self.dp = 1
        if cfg.dp != 1:
            from bliss_gnn_tpu.parallel import multihost
            from bliss_gnn_tpu.parallel.mesh import make_mesh

            multihost.initialize()
            n_dev = cfg.dp if cfg.dp > 0 else jax.device_count()
            if n_dev > jax.device_count():
                raise ValueError(
                    f"--dp {n_dev} exceeds the {jax.device_count()} visible "
                    f"devices"
                )
            if n_dev > 1:
                self.mesh = make_mesh(n_dev)
                self.dp = n_dev
        if cfg.shard_graph and self.dp <= 1:
            raise ValueError(
                "--shard-graph partitions the graph over the dp mesh; "
                "it requires --dp N with N > 1 (or 0 = all devices)"
            )
        if graph is None:
            graph, n_classes, multilabel = load_dataset(cfg.dataset)
            graph = Graph.canonicalize(graph, undirected=cfg.undirected)
            graph.edata["w"] = normalized_edata(graph)
        self.host_graph = graph
        self.n_classes = n_classes
        self.multilabel = multilabel
        dtype = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32
        pdtype = jnp.float32 if cfg.param_dtype == "float32" else jnp.bfloat16
        self.dtype, self.pdtype = dtype, pdtype

        self.feature_cache = None
        self.multi_step = None
        self.sharded_graph = None
        if cfg.use_uva:
            # features stay host-resident (numpy array or memmap); the
            # device sees everything else.  Composes with --dp (each device
            # samples its seed shard, one host gather serves the stacked
            # blocks) and --shard-graph (labels/graph stay range-sharded,
            # features host-resident — the papers100M configuration).
            from bliss_gnn_tpu.graph.featurecache import FeatureCache

            host_feat = graph.ndata["features"]  # keep memmaps unmaterialized
            cap = cfg.cache_size or min(graph.n_nodes, 1 << 21)
            self.feature_cache = FeatureCache(host_feat, cap, dtype=dtype)
            if cfg.shard_graph:
                from bliss_gnn_tpu.parallel.shardedstep import (
                    ShardedDeviceGraph,
                )

                shard_indptr = (
                    cfg.shard_indptr if cfg.shard_indptr is not None
                    else graph.n_nodes > 32_000_000
                )
                self.sharded_graph = ShardedDeviceGraph.build(
                    graph, self.dp, feature_dtype=dtype,
                    shard_indptr=shard_indptr, include_features=False,
                )
                self.graph = _device_graph_struct(graph, dtype)
            else:
                ndata_rest = {
                    k: v for k, v in graph.ndata.items() if k != "features"
                }
                ndata_all, graph.ndata = graph.ndata, ndata_rest
                self.graph = graph.to_device(feature_dtype=dtype)
                graph.ndata = ndata_all
        elif cfg.shard_graph:
            # edge-partitioned residency: no replicated device copy is ever
            # uploaded — each device holds its contiguous edge/node range
            # (parallel/shardedstep.py).  self.graph stays a shape-struct
            # facade for parameter-shape tracing; final_eval uploads a
            # replicated copy one-shot (beyond-HBM callers: see
            # parallel/edgeshard.py for sharded inference).
            from bliss_gnn_tpu.parallel.shardedstep import ShardedDeviceGraph

            shard_indptr = (
                cfg.shard_indptr if cfg.shard_indptr is not None
                else graph.n_nodes > 32_000_000
            )
            self.sharded_graph = ShardedDeviceGraph.build(
                graph, self.dp, feature_dtype=dtype,
                shard_indptr=shard_indptr,
            )
            self.graph = _device_graph_struct(graph, dtype)
        else:
            self.graph: DeviceGraph = graph.to_device(feature_dtype=dtype)
        # what step functions receive as the graph argument
        self._step_graph = (
            self.sharded_graph if cfg.shard_graph else self.graph
        )
        self.train_nid = np.where(graph.ndata["train_mask"])[0].astype(np.int32)
        self.val_nid = np.where(graph.ndata["val_mask"])[0].astype(np.int32)
        self.test_nid = np.where(graph.ndata["test_mask"])[0].astype(np.int32)

        fanouts = tuple(cfg.fan_out[: cfg.num_layers])
        assert len(fanouts) == cfg.num_layers, (
            f"need {cfg.num_layers} fan-outs, got {fanouts}"
        )
        self.sampler_cfg = SamplerConfig(
            kind=cfg.sampler,
            fanouts=fanouts,
            importance_sampling=cfg.importance_sampling,
            eta=cfg.eta,
            poisson_eps=cfg.poisson_eps,
            exp3_delta=cfg.exp3_delta,
            exp3_delta_formula=cfg.exp3_delta_formula,
            exp3_T=cfg.num_steps if cfg.num_steps > 0 else 5000,
            model=cfg.model,
        )
        self.model = build_model(
            cfg.model, cfg.num_hidden, n_classes, cfg.num_layers,
            dropout=cfg.dropout, num_in_heads=cfg.num_in_heads,
            num_out_heads=cfg.num_out_heads, attn_drop=cfg.attn_dropout,
            negative_slope=cfg.negative_slope, residual=cfg.residual,
            dtype=dtype, param_dtype=pdtype,
        )
        # GLOBAL batch size (matches the reference's --batch-size); under dp
        # it is rounded to a multiple of the device count and each device
        # samples/trains on batch/dp seeds.
        self.batch_size = min(cfg.batch_size, max(1, len(self.train_nid)))
        self.batch_size = max(
            self.dp, (self.batch_size // self.dp) * self.dp
        )
        self.steps_per_epoch = max(1, len(self.train_nid) // self.batch_size)
        self._build_for_batch_size(self.batch_size, init_state=True)

        # logging / callbacks state
        base = os.path.join(cfg.logdir, cfg.run_name)
        self.run_dir = next_version_dir(base)
        self.logger = MetricLogger(self.run_dir)
        self.ema_nodes = [EmaCounter(cfg.ema_w) for _ in range(cfg.num_layers + 1)]
        self.ema_edges = [EmaCounter(cfg.ema_w) for _ in range(cfg.num_layers)]
        self.welford = Welford()
        self.best_val_acc = -1.0
        self.best_state = None
        self.global_step = 0
        self._stop = False
        self._epochs_since_improve = 0
        self._steps_since_renorm = 0
        self.checkpoint_failures = 0
        self._checkpoint_saved = False
        if cfg.shard_graph:
            from bliss_gnn_tpu.parallel.shardedstep import make_sharded_renorm

            self._renorm_fn = make_sharded_renorm(
                self.mesh, cfg.num_layers, self.sharded_graph.epr
            )
        else:
            self._renorm_fn = jax.jit(
                lambda w: normalize_exp3_weights(w, cfg.num_layers),
                donate_argnums=0,
            )
        # persist the resolved config + capacity plan into the run dir
        # (hparams.yaml analog — Lightning save_hyperparameters,
        # train_lightning.py:63; re-written whenever the plan changes so a
        # version_* dir is always self-describing)
        self._save_hparams()
        if cfg.resume:
            # restart-from-step (SURVEY.md §5.3): restore the full state
            # pytree (params, opt_state, EXP3 arm weights, PRNG key, step)
            # and continue counting from the checkpointed step
            self._check_resume_hparams(cfg.resume)
            self.load_checkpoint(cfg.resume)
            self.global_step = int(self.state.step)
            print(f"[resume] restored step {self.global_step} from "
                  f"{cfg.resume}")

    # -- hyperparameter persistence --------------------------------------
    def _save_hparams(self):
        """Write the resolved TrainConfig + current CapacityPlan as JSON
        into the run dir (reference: Lightning's save_hyperparameters ->
        hparams.yaml, train_lightning.py:63).  Called at init and after
        every plan rebuild (refit/widen/batch resize)."""
        import json

        if not hasattr(self, "run_dir"):
            return  # plan rebuilt before logging exists (init ordering)
        payload = {
            "config": dataclasses.asdict(self.cfg),
            "capacity_plan": dataclasses.asdict(self.plan),
            "batch_size": self.batch_size,
            "dp": self.dp,
            "n_classes": self.n_classes,
            "multilabel": bool(self.multilabel),
        }
        with open(os.path.join(self.run_dir, "hparams.json"), "w") as f:
            json.dump(payload, f, indent=1, default=str)

    def _check_resume_hparams(self, ckpt_path: str):
        """Load-and-compare the persisted config of the run being resumed;
        mismatched keys are warned about, not fatal (resuming with e.g. a
        larger --num-steps is legitimate)."""
        import json

        run_dir = os.path.dirname(os.path.dirname(os.path.abspath(ckpt_path)))
        path = os.path.join(run_dir, "hparams.json")
        if not os.path.exists(path):
            return
        saved = json.load(open(path)).get("config", {})
        cur = json.loads(
            json.dumps(dataclasses.asdict(self.cfg), default=str)
        )
        diffs = {
            k: (saved[k], cur[k])
            for k in saved
            if k in cur and saved[k] != cur[k] and k not in ("resume", "logdir")
        }
        if diffs:
            warnings.warn(
                f"[resume] config differs from the checkpointed run's "
                f"hparams.json: {diffs}", RuntimeWarning, stacklevel=2,
            )

    # -- static-shape (re)build -----------------------------------------
    def _build_for_batch_size(self, batch_size: int, init_state: bool):
        cfg = self.cfg
        g = self.host_graph
        self.batch_size = batch_size
        indeg = g.in_degrees()
        self._max_degree = int(indeg.max())
        # the capacity plan sizes ONE device's shapes: local batch under dp
        self.plan = CapacityPlan.build(
            batch_size // self.dp, self.sampler_cfg.fanouts, g.n_nodes,
            g.n_edges,
            kind=cfg.sampler, frontier_slack=cfg.frontier_slack,
            block_edge_slack=cfg.block_edge_slack,
            max_frontier_edges=cfg.max_frontier_edges,
            deg_std=float(indeg.std()), max_degree=self._max_degree,
        )
        # capacity-refit bookkeeping (reset whenever the plan is rebuilt
        # from the formula, e.g. on a batch-size change)
        self._refit_done = False
        self._refit_max: Dict[str, float] = {}
        self._overflow_after_refit = False
        self._frontier_overflow_after_refit = False
        self._exp3_over_warned = False
        self.tx = make_optimizer(
            cfg.lr, self.steps_per_epoch, cfg.lr_gamma, cfg.lr_step_size
        )
        if init_state:
            key = jax.random.PRNGKey(cfg.seed)
            key, init_key = jax.random.split(key)
            params = self._init_params(init_key)
            exp3 = (
                init_exp3_weights(
                    cfg.num_layers, g.n_edges,
                    dtype=jnp.bfloat16 if cfg.exp3_dtype == "bfloat16"
                    else jnp.float32,
                )
                if self.sampler_cfg.is_bandit
                else None
            )
            if exp3 is not None and cfg.shard_graph:
                from bliss_gnn_tpu.parallel.shardedstep import shard_exp3

                exp3 = shard_exp3(
                    exp3, cfg.num_layers, g.n_edges, self.dp
                )
            self.state = TrainState(
                params=params,
                opt_state=self.tx.init(params),
                exp3_weights=exp3,
                key=key,
                step=jnp.zeros((), jnp.int32),
            )
        self._rebuild_steps()

    def _rebuild_steps(self):
        """(Re-)jit the step functions for the current ``self.plan`` —
        called at build time and again after a capacity refit/widen."""
        cfg = self.cfg
        self._save_hparams()  # keep the run dir's plan record current
        if self.feature_cache is not None:
            from bliss_gnn_tpu.train.steps import make_uva_steps

            storage = None
            if cfg.shard_graph:
                from bliss_gnn_tpu.parallel.shardedstep import ShardedStorage

                storage = ShardedStorage(
                    "dp", self.sharded_graph.epr, self.sharded_graph.npr,
                    self.sampler_cfg.n_layers,
                )
            self._sample_fn, self._uva_train_fn, self._uva_eval_fn = (
                make_uva_steps(
                    self.model, self.tx, self.sampler_cfg, self.plan,
                    self.multilabel,
                    mesh=self.mesh if self.dp > 1 else None,
                    storage=storage,
                )
            )
            self.train_step = self._uva_train_step
            self.eval_step = self._uva_eval_step
            self.multi_step = None
        elif cfg.shard_graph:
            from bliss_gnn_tpu.parallel.shardedstep import (
                make_sharded_eval_step,
                make_sharded_multi_train_step,
                make_sharded_train_step,
            )

            self.train_step = make_sharded_train_step(
                self.mesh, self.sharded_graph, self.model, self.tx,
                self.sampler_cfg, self.plan, self.multilabel,
                exp3_normalize=False,
            )
            self.eval_step = make_sharded_eval_step(
                self.mesh, self.sharded_graph, self.model,
                self.sampler_cfg, self.plan, self.multilabel,
            )
            self.multi_step = None
            if cfg.steps_per_call > 1:
                self.multi_step = make_sharded_multi_train_step(
                    self.mesh, self.sharded_graph, self.model, self.tx,
                    self.sampler_cfg, self.plan, self.multilabel,
                    cfg.steps_per_call, exp3_normalize=False,
                )
        elif self.dp > 1:
            from bliss_gnn_tpu.parallel.dp import (
                make_dp_eval_step,
                make_dp_multi_train_step,
                make_dp_train_step,
            )

            self.train_step = make_dp_train_step(
                self.mesh, self.graph, self.model, self.tx,
                self.sampler_cfg, self.plan, self.multilabel,
                exp3_normalize=False,
            )
            self.eval_step = make_dp_eval_step(
                self.mesh, self.model, self.sampler_cfg, self.plan,
                self.multilabel,
            )
            self.multi_step = None
            if cfg.steps_per_call > 1:
                self.multi_step = make_dp_multi_train_step(
                    self.mesh, self.graph, self.model, self.tx,
                    self.sampler_cfg, self.plan, self.multilabel,
                    cfg.steps_per_call, exp3_normalize=False,
                )
        else:
            self.train_step = make_train_step(
                self.graph, self.model, self.tx, self.sampler_cfg, self.plan,
                self.multilabel,
            )
            self.eval_step = make_eval_step(
                self.graph, self.model, self.sampler_cfg, self.plan,
                self.multilabel,
            )
            self.multi_step = None
            if cfg.steps_per_call > 1:
                from bliss_gnn_tpu.train.steps import make_multi_train_step

                self.multi_step = make_multi_train_step(
                    self.graph, self.model, self.tx, self.sampler_cfg,
                    self.plan, self.multilabel, cfg.steps_per_call,
                )
        # chained validation (one dispatch per K val batches); UVA stays
        # unchained — its host feature gather splits every batch anyway
        self.multi_eval = None
        if cfg.eval_steps_per_call > 1 and self.feature_cache is None:
            if cfg.shard_graph:
                from bliss_gnn_tpu.parallel.shardedstep import (
                    make_sharded_multi_eval_step,
                )

                self.multi_eval = make_sharded_multi_eval_step(
                    self.mesh, self.sharded_graph, self.model,
                    self.sampler_cfg, self.plan, self.multilabel,
                )
            elif self.dp > 1:
                from bliss_gnn_tpu.parallel.dp import make_dp_multi_eval_step

                self.multi_eval = make_dp_multi_eval_step(
                    self.mesh, self.model, self.sampler_cfg, self.plan,
                    self.multilabel,
                )
            else:
                from bliss_gnn_tpu.train.steps import make_multi_eval_step

                self.multi_eval = make_multi_eval_step(
                    self.model, self.sampler_cfg, self.plan, self.multilabel,
                )

    # -- UVA (host-feature) step wrappers --------------------------------
    def _uva_gather(self, blocks):
        """Host feature fetch for the input block's src table.  Under dp
        the blocks are mesh-stacked [S, ...]; one flattened cache gather
        serves every shard (a real pod would run one cache per host)."""
        gids, mask = blocks[0].src_gids, blocks[0].src_mask
        if gids.ndim > 1:
            x, miss = self.feature_cache.gather(
                gids.reshape(-1), mask.reshape(-1)
            )
            return x.reshape(gids.shape + (x.shape[-1],)), miss
        return self.feature_cache.gather(gids, mask)

    def _uva_train_step(self, state, seeds, smask, graph):
        blocks, samp_stats, k_drop, key = self._sample_fn(
            state, seeds, smask, graph
        )
        x, miss = self._uva_gather(blocks)
        state, metrics = self._uva_train_fn(
            state, blocks, x, k_drop, key, graph
        )
        metrics = dict(metrics)
        metrics["cache_miss"] = miss  # train_lightning.py:454-461
        for k, v in samp_stats.items():
            if ("overflow" in k or "frontier_edges" in k
                    or "n_block_edges_true" in k):
                metrics[k] = v  # overflow counters + capacity-refit maxima
        return state, metrics

    def _uva_eval_step(self, state, key, seeds, smask, graph):
        state_k = dataclasses.replace(state, key=key)
        blocks, _, _, _ = self._sample_fn(state_k, seeds, smask, graph)
        x, _ = self._uva_gather(blocks)
        return self._uva_eval_fn(state, blocks, x, graph)

    def _init_params(self, key):
        # init by tracing one sampled batch shape
        seeds = jnp.zeros(self.plan.dst_caps[-1], jnp.int32)
        smask = jnp.zeros(self.plan.dst_caps[-1], bool).at[0].set(True)
        exp3 = (
            init_exp3_weights(self.cfg.num_layers, self.host_graph.n_edges)
            if self.sampler_cfg.is_bandit else None
        )
        # graph passed as an eval_shape ARGUMENT: under --shard-graph it is
        # a ShapeDtypeStruct facade (never uploaded), which eval_shape
        # abstracts happily
        blocks, _ = jax.eval_shape(
            lambda k, gg: sample_blocks(
                gg, self.sampler_cfg, self.plan, k, seeds, smask, exp3
            ),
            jax.random.PRNGKey(0), self.graph,
        )
        blocks_z = jax.tree.map(
            lambda s: jnp.zeros(s.shape, s.dtype), blocks,
        )
        feat_dim = (
            self.feature_cache.host.shape[1]
            if self.feature_cache is not None
            else self.graph.ndata["features"].shape[1]
        )
        x = jnp.zeros(
            (blocks_z[0].src_gids.shape[0], feat_dim), self.dtype,
        )
        return self.model.init(key, blocks_z, x)

    def _put_batch(self, arr, batch_dim: int = -1):
        """Transfer a host seed batch / mask; under dp this builds a global
        (multi-process-safe) array sharded along the batch dim."""
        if self.dp > 1:
            from bliss_gnn_tpu.parallel.multihost import global_seed_batch

            return global_seed_batch(
                self.mesh, np.asarray(arr), batch_dim=batch_dim
            )
        return jnp.asarray(arr)

    # -- epoch loops -----------------------------------------------------
    def _epoch_batches(self, rng: np.random.Generator) -> np.ndarray:
        ids = rng.permutation(self.train_nid)
        n_full = len(ids) // self.batch_size  # drop_last=True (train)
        return ids[: n_full * self.batch_size].reshape(n_full, self.batch_size)

    def fit(self):
        cfg = self.cfg
        rng = np.random.default_rng(cfg.seed + 1)
        max_steps = cfg.num_steps if cfg.num_steps > 0 else math.inf
        max_epochs = cfg.num_epochs if cfg.num_epochs > 0 else math.inf
        if max_steps is math.inf and max_epochs is math.inf:
            max_epochs = 1000  # Lightning default
        epoch = 0
        prev_t = time.time()
        while epoch < max_epochs and self.global_step < max_steps and not self._stop:
            batches = self._epoch_batches(rng)
            smask = self._put_batch(np.ones(self.batch_size, bool))
            K = self.cfg.steps_per_call if self.multi_step is not None else 1
            b = 0
            while b < batches.shape[0]:
                # run the capacity-refit pilot steps UNCHAINED: compiling
                # the K-step chain at the (loose) formula caps would be
                # thrown away by the refit recompile a moment later
                pilot = cfg.refit_after > 0 and not self._refit_done
                chain = K > 1 and not pilot and b + K <= batches.shape[0] and (
                    self.global_step + K <= max_steps
                ) and cfg.profile_steps == 0
                if chain:
                    seeds = self._put_batch(batches[b : b + K])
                    masks = self._put_batch(
                        np.ones((K, self.batch_size), bool)
                    )
                    st = time.time()
                    self.state, mstack = self.multi_step(
                        self.state, seeds, masks, self._step_graph
                    )
                    mstack = jax.device_get(mstack)
                    fb_time = (time.time() - st) / K
                    for k in range(K):
                        metrics = jax.tree.map(lambda a: a[k], mstack)
                        self.global_step += 1
                        self._log_train_step(metrics, prev_t, fb_time)
                        prev_t = time.time()
                        self.welford.push(float(metrics["num_nodes/0"]))
                    b += K
                else:
                    seeds = self._put_batch(batches[b])
                    if cfg.profile_steps > 0 and self.global_step == 2:
                        jax.profiler.start_trace(
                            os.path.join(self.run_dir, "profile")
                        )
                    st = time.time()
                    self.state, metrics = self.train_step(
                        self.state, seeds, smask, self._step_graph
                    )
                    metrics = jax.device_get(metrics)
                    fb_time = time.time() - st
                    if (
                        cfg.profile_steps > 0
                        and self.global_step == 2 + cfg.profile_steps
                    ):
                        jax.profiler.stop_trace()
                    self.global_step += 1
                    self._log_train_step(metrics, prev_t, fb_time)
                    prev_t = time.time()
                    self.welford.push(float(metrics["num_nodes/0"]))
                    b += 1
                self._maybe_renorm_exp3()
                self._maybe_capacity_refit()
                if self.global_step >= max_steps:
                    break
            epoch += 1
            val_acc = self._validate(epoch)
            self._maybe_checkpoint(val_acc)
            self._early_stopping(val_acc)
            self._vertex_limit_controller()
        self.logger.flush()
        return self

    def _log_train_step(self, metrics, prev_t, fb_time):
        cfg = self.cfg
        scalars = {}
        for i in range(cfg.num_layers):
            scalars[f"num_nodes/{i}"] = self.ema_nodes[i].push(
                float(metrics[f"num_nodes/{i}"])
            )
            scalars[f"num_edges/{i}"] = self.ema_edges[i].push(
                float(metrics[f"num_edges/{i}"])
            )
        scalars[f"num_nodes/{cfg.num_layers}"] = self.ema_nodes[
            cfg.num_layers
        ].push(float(metrics[f"num_nodes/{cfg.num_layers}"]))
        f1 = metrics["f1"]
        scalars["train_acc"] = float(
            f1_compute(f1, self.multilabel)
        )
        scalars["train_loss"] = float(metrics["train_loss"])
        scalars["iter_time"] = time.time() - prev_t
        scalars["forward_backward_time"] = fb_time
        for k, v in metrics.items():
            if "overflow" in k and float(v) > 0:
                scalars[k] = float(v)
                if k == "exp3_apply_overflow" and not self._exp3_over_warned:
                    # the streaming EXP3 kernel SKIPPED updates (a tile run
                    # longer than its SMEM window) — bandit training is
                    # silently degraded vs the exact XLA/sharded paths
                    warnings.warn(
                        f"exp3_apply_overflow={float(v):.0f} at step "
                        f"{self.global_step}: streaming EXP3 apply skipped "
                        "updates; bandit state diverges from the exact "
                        "multiplicative update (raise ops.exp3_pallas.UBLK "
                        "or lower per-layer edge capacity)",
                        RuntimeWarning,
                        stacklevel=2,
                    )
                    self._exp3_over_warned = True
                # widen only for caps widen() can actually grow — extra
                # overflow is a Poisson-count fluctuation, not refit-caused
                if self._refit_done and (
                    "frontier_overflow" in k or "block_edge_overflow" in k
                ):
                    self._overflow_after_refit = True
                    if "frontier_overflow" in k:
                        self._frontier_overflow_after_refit = True
            elif "frontier_edges" in k or "n_block_edges_true" in k:
                self._refit_max[k] = max(
                    self._refit_max.get(k, 0.0), float(v)
                )
        if "cache_miss" in metrics:
            scalars["cache_miss"] = float(metrics["cache_miss"])
        self.logger.log(self.global_step, scalars)

    def _maybe_capacity_refit(self):
        """Tighten the plan to measured maxima after ``refit_after`` steps;
        widen it back out if a tightened cap overflows later."""
        cfg = self.cfg
        if cfg.refit_after <= 0:
            return
        L = cfg.num_layers
        if not self._refit_done:
            if self.global_step < cfg.refit_after:
                return
            fr = [
                int(self._refit_max.get(f"layer{l}/frontier_edges", 0))
                for l in range(L)
            ]
            be = [
                int(self._refit_max.get(f"layer{l}/n_block_edges_true", 0))
                for l in range(L)
            ]
            self._refit_done = True
            if min(fr) <= 0 or min(be) <= 0:
                return
            new = self.plan.refit(
                fr, be,
                block_edge_slack=cfg.refit_block_edge_slack,
                frontier_slack=cfg.refit_frontier_slack,
                max_degree=self._max_degree,
            )
            if new != self.plan:
                self.plan = new
                self._rebuild_steps()
        elif self._overflow_after_refit:
            self.plan = self.plan.widen(
                1.5, frontier=self._frontier_overflow_after_refit
            )
            self._overflow_after_refit = False
            self._frontier_overflow_after_refit = False
            self._rebuild_steps()

    def _validate(self, epoch: int) -> float:
        if len(self.val_nid) == 0:
            return float("nan")
        f1 = F1State.zero()
        loss_sum, n_sum = 0.0, 0.0
        key = jax.random.PRNGKey(self.cfg.seed + 1000 + epoch)
        B = self.batch_size
        n_batches = -(-len(self.val_nid) // B)

        def batch_arrays(b0, k):
            """k padded val batches starting at batch b0, stacked [k, B]."""
            seeds = np.zeros((k, B), np.int32)
            masks = np.zeros((k, B), bool)
            for j in range(k):
                chunk = self.val_nid[(b0 + j) * B : (b0 + j + 1) * B]
                seeds[j, : len(chunk)] = chunk
                masks[j, : len(chunk)] = True
            return seeds, masks

        K = self.cfg.eval_steps_per_call
        b = 0
        while b < n_batches:
            if self.multi_eval is not None and b + K <= n_batches:
                seeds, masks = batch_arrays(b, K)
                df1, dloss, dn, key = self.multi_eval(
                    self.state, key, self._put_batch(seeds),
                    self._put_batch(masks), self._step_graph,
                )
                b += K
            else:
                seeds, masks = batch_arrays(b, 1)
                key, sub = jax.random.split(key)
                df1, dloss, dn = self.eval_step(
                    self.state, sub, self._put_batch(seeds[0]),
                    self._put_batch(masks[0]), self._step_graph,
                )
                b += 1
            f1 = jax.tree.map(lambda a, b: a + b, f1, df1)
            loss_sum += float(dloss)
            n_sum += float(dn)
        val_acc = float(f1_compute(f1, self.multilabel))
        val_loss = loss_sum / max(n_sum, 1)
        self.logger.log(self.global_step, {"val_acc": val_acc, "val_loss": val_loss})
        return val_acc

    def _maybe_renorm_exp3(self, force: bool = False):
        """Deferred EXP3 L1 row normalization (the fused step runs with
        normalize=False; see samplers.apply_exp3_deltas).  Runs every
        exp3_renorm_every steps, and always before checkpoints/eval so
        persisted state matches the reference's normalized convention."""
        if self.state.exp3_weights is None:
            return
        self._steps_since_renorm = self.global_step - getattr(
            self, "_last_renorm_step", 0
        )
        if force or self._steps_since_renorm >= max(
            1, self.cfg.exp3_renorm_every
        ):
            self.state = dataclasses.replace(
                self.state,
                exp3_weights=self._renorm_fn(self.state.exp3_weights),
            )
            self._last_renorm_step = self.global_step

    def _maybe_checkpoint(self, val_acc: float):
        self._maybe_renorm_exp3(force=True)
        if math.isnan(val_acc):
            self.best_state = jax.device_get(self.state)
            return
        if val_acc > self.best_val_acc:
            self.best_val_acc = val_acc
            self._epochs_since_improve = 0
            self.best_state = jax.device_get(self.state)
            if not self.cfg.disable_checkpoint:
                self._save_checkpoint()
        else:
            self._epochs_since_improve += 1

    def _save_checkpoint(self):
        """Persist the best state.  Failures are LOUD: warn on the first
        one, count every one into the `checkpoint_failures` metric
        stream, and final_eval raises if checkpointing was enabled but
        nothing was ever persisted — a run whose ModelCheckpoint
        silently died must not report success (the reference's Lightning
        ModelCheckpoint would raise, train_lightning.py:622-625)."""
        try:
            import orbax.checkpoint as ocp

            path = os.path.join(os.path.abspath(self.run_dir), "checkpoints", "best")
            ckptr = ocp.StandardCheckpointer()
            ckptr.save(path, self.best_state, force=True)
            ckptr.wait_until_finished()
            self._checkpoint_saved = True
        except Exception as e:
            self.checkpoint_failures += 1
            if self.checkpoint_failures == 1:
                warnings.warn(
                    f"[checkpoint] save failed (will keep training; "
                    f"final_eval raises if no checkpoint ever lands): {e}"
                )
            self.logger.log(
                self.global_step,
                {"checkpoint_failures": float(self.checkpoint_failures)},
            )

    def restore_best(self):
        """Reload the best-val_acc state for final eval
        (train_lightning.py:662-685)."""
        if self.best_state is not None:
            self.state = jax.device_put(self.best_state)

    def load_checkpoint(self, path: Optional[str] = None):
        """Restore the full state pytree (params, opt_state, EXP3 arm
        weights, PRNG key, step) from an orbax checkpoint — resume support
        the reference lacks (its EXP3 state is never checkpointed,
        SURVEY.md §5.4)."""
        import orbax.checkpoint as ocp

        if path is None:
            path = os.path.join(
                os.path.abspath(self.run_dir), "checkpoints", "best"
            )
        ckptr = ocp.StandardCheckpointer()
        template = jax.tree.map(np.asarray, jax.device_get(self.state))
        restored = ckptr.restore(path, template)
        self.state = jax.device_put(restored)
        self.best_state = restored
        return self

    def _early_stopping(self, val_acc: float):
        if math.isnan(val_acc):
            return
        if self.global_step < self.cfg.min_steps:
            return  # Trainer(min_steps=...) parity (train_lightning.py:653)
        if val_acc >= self.cfg.val_acc_target:
            self._stop = True
        if self._epochs_since_improve >= self.cfg.early_stopping_patience:
            self._stop = True

    def _vertex_limit_controller(self):
        """BatchSizeCallback.on_train_epoch_end (train_lightning.py:473-486).
        NOTE: resizing the batch rebuilds static shapes -> recompile."""
        w, limit = self.welford, self.cfg.vertex_limit
        if (
            limit > 0 and w.n >= 2
            and abs(limit - w.m) * w.n >= w.std * 3
        ):
            new_bs = max(1, int(self.batch_size * limit / max(w.m, 1)))
            new_bs = max(self.dp, (new_bs // self.dp) * self.dp)
            if new_bs != self.batch_size:
                self.batch_size = new_bs
                self.steps_per_epoch = max(
                    1, len(self.train_nid) // self.batch_size
                )
                self._build_for_batch_size(new_bs, init_state=False)
            self.welford.clear()

    # -- final eval ------------------------------------------------------
    def final_eval(self) -> Dict[str, float]:
        """Full-graph layerwise inference + micro-F1 per split
        (train_lightning.py:686-705)."""
        cfg = self.cfg
        if (
            not cfg.disable_checkpoint
            and self.checkpoint_failures > 0
            and not self._checkpoint_saved
        ):
            raise RuntimeError(
                f"checkpointing was enabled but every save failed "
                f"({self.checkpoint_failures} failures) — the best state "
                f"was never persisted; refusing to report a successful "
                f"run (pass disable_checkpoint to train without "
                f"persistence)"
            )
        heads = tuple(
            [cfg.num_in_heads] * (cfg.num_layers - 1) + [cfg.num_out_heads]
        )
        graph = self.graph
        if cfg.shard_graph:
            # node-sharded layerwise inference: ring SpMM for SAGE/GCN,
            # ring attention with shard-local online edge softmax for GATv2
            # — per-device memory stays O(N/S * F + E/S), no replicated
            # upload ever (parallel/edgeshard.py)
            from bliss_gnn_tpu.models.inference import (
                layerwise_inference_sharded,
            )

            logits = layerwise_inference_sharded(
                cfg.model, self.state.params, self.host_graph, self.mesh,
                cfg.num_layers, dtype=self.dtype, heads=heads,
                negative_slope=cfg.negative_slope, residual=cfg.residual,
            )
            labels = jnp.asarray(self.host_graph.ndata["labels"])
            return self._split_f1(logits, labels)
        if self.feature_cache is not None:
            # UVA: never upload the full feature matrix.  dp > 1 runs the
            # node-sharded ring inference straight off the host features;
            # single-device streams dst chunks with host-resident
            # activations (the reference's UVA DataLoader inference,
            # model.py:351-362 / train_lightning.py:688-694).
            from bliss_gnn_tpu.models.inference import (
                layerwise_inference_sharded,
                layerwise_inference_uva,
            )

            if self.dp > 1:
                logits = layerwise_inference_sharded(
                    cfg.model, self.state.params, self.host_graph,
                    self.mesh, cfg.num_layers, dtype=self.dtype,
                    heads=heads, negative_slope=cfg.negative_slope,
                    residual=cfg.residual,
                    features=self.feature_cache.host,
                )
            else:
                logits = layerwise_inference_uva(
                    cfg.model, self.state.params, self.host_graph,
                    cfg.num_layers, heads=heads,
                    negative_slope=cfg.negative_slope,
                    residual=cfg.residual, dtype=self.dtype,
                    features=self.feature_cache.host,
                )
            labels = jnp.asarray(self.host_graph.ndata["labels"])
            return self._split_f1(jnp.asarray(logits), labels)
        spmm = None
        gat_attn = None
        backend = cfg.inference_backend
        if backend == "auto":
            # measured-best default: the dual hybrid/packed routing (173 M
            # edges/s at F=602, 367 M at hidden widths vs 137 M for the
            # plain banded kernel) whenever the graph is Pallas-sized and
            # the extra layouts fit HBM; plain banded otherwise
            if (
                self.host_graph.n_edges > 2_000_000
                and jax.default_backend() not in ("cpu",)
            ):
                from bliss_gnn_tpu.models.inference import (
                    dual_spmm_hbm_bytes,
                    free_device_hbm,
                )

                # feature width from the HOST graph: under --use-uva the
                # device graph's ndata excludes 'features' (host-resident
                # until the upload below)
                need = dual_spmm_hbm_bytes(
                    self.host_graph.n_nodes, self.host_graph.n_edges,
                    int(self.host_graph.ndata["features"].shape[1]),
                )
                backend = (
                    "hybrid" if need < 0.6 * free_device_hbm() else "pallas"
                )
            else:
                backend = "xla"
        use_pallas = backend in ("pallas", "hybrid")
        if (
            cfg.model == "gat"
            and not use_pallas
            and jax.default_backend() not in ("cpu",)
            and self.host_graph.n_edges > 2_000_000
        ):
            # hard fence: the XLA streaming edge-softmax path is known to
            # crash the TPU worker at full scale (README); auto-routing
            # never selects it there, but an explicit --inference-backend
            # xla must fail loudly instead of killing the worker
            raise RuntimeError(
                "full-graph GATv2 inference through the XLA streaming path "
                f"is unstable on TPU at {self.host_graph.n_edges} edges "
                "(worker crash) — use --inference-backend auto or pallas "
                "(banded online-softmax kernel)"
            )
        if use_pallas and cfg.model in ("sage", "gcn"):
            if backend == "hybrid":
                # per-layer routing: degree-sorted dense-block kernel for
                # wide features, packed banded kernel for hidden layers.
                # The O(E log E) host layout build (~3 min at Reddit scale)
                # is cached on disk next to the XLA compile cache.
                from bliss_gnn_tpu.models.inference import make_dual_spmm

                cache_dir = os.path.join(os.getcwd(), ".jax_cache")
                os.makedirs(cache_dir, exist_ok=True)
                spmm = make_dual_spmm(
                    graph,
                    cache_path=os.path.join(
                        cache_dir,
                        f"hybrid_{self.host_graph.n_nodes}_"
                        f"{self.host_graph.n_edges}_300.npz",
                    ),
                )
            else:
                from bliss_gnn_tpu.models.inference import make_pallas_spmm

                spmm = make_pallas_spmm(graph)
        if use_pallas and cfg.model == "gat":
            from bliss_gnn_tpu.models.inference import make_pallas_gat

            gat_attn = make_pallas_gat(graph)
        logits = layerwise_inference(
            cfg.model, self.state.params, graph, cfg.num_layers,
            heads=heads, negative_slope=cfg.negative_slope,
            residual=cfg.residual, dtype=self.dtype, spmm=spmm,
            gat_attn=gat_attn,
        )
        return self._split_f1(logits, graph.ndata["labels"])

    def _split_f1(self, logits, labels) -> Dict[str, float]:
        """Per-split micro-F1 of full-graph logits + Final Accuracy logging
        (train_lightning.py:694-705)."""
        logits = jnp.asarray(logits)
        out = {}
        for nid, split in [
            (self.train_nid, "Train"),
            (self.val_nid, "Validation"),
            (self.test_nid, "Test"),
        ]:
            if len(nid) == 0:
                out[split] = float("nan")
                continue
            nid_j = jnp.asarray(nid)
            f1 = f1_update(
                F1State.zero(),
                jnp.take(logits, nid_j, axis=0),
                jnp.take(labels, nid_j, axis=0),
                jnp.ones(len(nid), bool),
                self.multilabel,
            )
            acc = float(f1_compute(f1, self.multilabel))
            out[split] = acc
            self.logger.log(0, {f"Final Accuracy/{split}": acc})
            print(f"{split} accuracy: {acc}")
        self.logger.flush()
        return out
