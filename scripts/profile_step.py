"""Time the fused train step at the Reddit config on the real TPU, with
stage attribution (sample-only vs full step).

PYTHONPATH=.:/root/.axon_site python scripts/profile_step.py
Env: BLISS_PROF_SCALE (default 1.0), BLISS_PROF_TRACE=1 for a profiler trace.
"""
import os
import time

import numpy as np

import jax
import jax.numpy as jnp

from bliss_gnn_tpu.utils.logging import enable_compilation_cache

enable_compilation_cache()

SCALE = float(os.environ.get("BLISS_PROF_SCALE", "1.0"))
N_NODES = int(232_965 * SCALE)
N_FEATS = 602
N_CLASSES = 41


def log(m):
    print(f"[prof +{time.time()-T0:.0f}s] {m}", flush=True)


T0 = time.time()

# reuse the bench graph cache (already dst-sorted CSC)
import bench  # noqa: E402  (repo-root module)

bench.N_NODES = N_NODES
bench.N_EDGES = int((114_615_892 + 232_965) * SCALE)
indptr, csc_src = bench.build_graph()
n_edges = len(csc_src)
log(f"graph ready: {N_NODES} nodes, {n_edges} edges")

from bliss_gnn_tpu.graph.structure import DeviceGraph  # noqa: E402
from bliss_gnn_tpu.sampling.frontier import EDGE_PAD, edge_grid  # noqa: E402
from bliss_gnn_tpu.sampling.block import CapacityPlan  # noqa: E402
from bliss_gnn_tpu.sampling.samplers import (  # noqa: E402
    SamplerConfig,
    init_exp3_weights,
    sample_blocks,
)
from bliss_gnn_tpu.models.gnn import build_model  # noqa: E402
from bliss_gnn_tpu.train.steps import (  # noqa: E402
    TrainState,
    make_optimizer,
    make_train_step,
)

# normalized 1/in_deg edge weights (host, vectorized)
deg = np.diff(indptr)
w = (1.0 / np.maximum(deg, 1.0)).repeat(deg).astype(np.float32)


def pad_e(a):
    return np.concatenate([a, np.zeros(EDGE_PAD, a.dtype)])


dummy = jnp.zeros(1, jnp.int32)
key = jax.random.PRNGKey(0)
graph = DeviceGraph(
    n_nodes=N_NODES,
    n_edges=n_edges,
    csc_indptr=jnp.asarray(indptr, jnp.int32),
    csc_src=jnp.asarray(pad_e(csc_src.astype(np.int32))),
    csr_indptr=dummy, csr_dst=dummy, csr_eid=dummy,
    ndata=dict(
        features=jax.random.normal(key, (N_NODES, N_FEATS), jnp.bfloat16),
        labels=jax.random.randint(key, (N_NODES,), 0, N_CLASSES),
    ),
    edata=dict(
        w=jnp.asarray(pad_e(w), jnp.bfloat16),
        __grid__csc_src=jnp.asarray(edge_grid(csc_src.astype(np.int32))),
        __grid__w=jnp.asarray(edge_grid(w), jnp.bfloat16),
    ),
)
jax.block_until_ready(graph.csc_src)
log("graph on device")

MODEL = os.environ.get("BLISS_PROF_MODEL", "sage")
cfg = SamplerConfig(kind="poisson-bandit", fanouts=(4096, 2048, 1024),
                    model=MODEL)
plan = CapacityPlan.build(256, cfg.fanouts, N_NODES, n_edges,
                          kind=cfg.kind, deg_std=float(deg.std()),
                          max_degree=int(deg.max()))
log(f"plan: frontier={plan.frontier_caps} block_e={plan.block_e_caps} "
    f"cand={plan.cand_caps}")
model = build_model(MODEL, 256, N_CLASSES, 3)
exp3 = init_exp3_weights(3, n_edges)

seeds = jnp.asarray(
    np.random.default_rng(0).integers(0, N_NODES, 256), jnp.int32
)
smask = jnp.ones(256, bool)

# --- sample-only timing ---
samp = jax.jit(lambda k, s, m, g, e: jax.tree.map(
    lambda x: x, sample_blocks(g, cfg, plan, k, s, m, e)))
out = samp(jax.random.PRNGKey(1), seeds, smask, graph, exp3)
jax.block_until_ready(out)
log("sample compiled")
ts = []
for i in range(3):
    t0 = time.perf_counter()
    out = samp(jax.random.PRNGKey(i), seeds, smask, graph, exp3)
    float(out[0][0].e_weight[0])
    ts.append(time.perf_counter() - t0 - 0.033)
log(f"sample_blocks: {min(ts)*1e3:.0f} ms")

# --- full step timing ---
blocks, _ = out
x = jnp.take(graph.ndata["features"], blocks[0].src_gids, axis=0)
params = model.init(jax.random.PRNGKey(2), blocks, x)
tx = make_optimizer(2e-3, 100)
state = TrainState(params=params, opt_state=tx.init(params),
                   exp3_weights=exp3, key=jax.random.PRNGKey(3),
                   step=jnp.zeros((), jnp.int32))
step = make_train_step(graph, model, tx, cfg, plan, False)
state, metrics = step(state, seeds, smask, graph)
float(metrics["train_loss"])
log("step compiled")
if os.environ.get("BLISS_PROF_TRACE"):
    jax.profiler.start_trace("/tmp/bliss_prof")
ts = []
for i in range(3):
    t0 = time.perf_counter()
    state, metrics = step(state, seeds, smask, graph)
    float(metrics["train_loss"])
    ts.append(time.perf_counter() - t0 - 0.033)
if os.environ.get("BLISS_PROF_TRACE"):
    jax.profiler.stop_trace()
    log("trace in /tmp/bliss_prof")
ovf = {k: int(v) for k, v in metrics.items() if "overflow" in k}
log(f"full train step: {min(ts)*1e3:.0f} ms "
    f"(loss {float(metrics['train_loss']):.3f}, "
    f"edges l0 {int(metrics['num_edges/0'])}, overflow {ovf})")

# --- capacity refit: tighten to measured maxima and re-time -------------
_, sstats = out if isinstance(out, tuple) else (None, None)
exp3_live = state.exp3_weights  # `exp3` was donated into the step
blocks_s, sstats = samp(jax.random.PRNGKey(9), seeds, smask, graph, exp3_live)
fr = [int(sstats[f"layer{l}/frontier_edges"]) for l in range(3)]
be = [int(sstats[f"layer{l}/n_block_edges_true"]) for l in range(3)]
tight = plan.refit(fr, be, max_degree=int(deg.max()))
log(f"refit: frontier {plan.frontier_caps} -> {tight.frontier_caps}")
log(f"refit: block_e  {plan.block_e_caps} -> {tight.block_e_caps}")

samp_t = jax.jit(lambda k, s, m, g, e: jax.tree.map(
    lambda x: x, sample_blocks(g, cfg, tight, k, s, m, e)))
out_t = samp_t(jax.random.PRNGKey(1), seeds, smask, graph, exp3_live)
jax.block_until_ready(out_t)
log("refit sample compiled")
if os.environ.get("BLISS_PROF_TRACE_REFIT"):
    jax.profiler.start_trace("/tmp/bliss_prof_refit_samp")
ts = []
for i in range(3):
    t0 = time.perf_counter()
    out_t = samp_t(jax.random.PRNGKey(i), seeds, smask, graph, exp3_live)
    float(out_t[0][0].e_weight[0])
    ts.append(time.perf_counter() - t0 - 0.033)
if os.environ.get("BLISS_PROF_TRACE_REFIT"):
    jax.profiler.stop_trace()
    log("refit sample trace in /tmp/bliss_prof_refit_samp")
log(f"refit sample_blocks: {min(ts)*1e3:.0f} ms")

del exp3_live
step_t = make_train_step(graph, model, tx, cfg, tight, False)
state, metrics = step_t(state, seeds, smask, graph)
float(metrics["train_loss"])
log("refit step compiled")
if os.environ.get("BLISS_PROF_TRACE_REFIT"):
    jax.profiler.start_trace("/tmp/bliss_prof_refit_step")
ts = []
for i in range(3):
    t0 = time.perf_counter()
    state, metrics = step_t(state, seeds, smask, graph)
    float(metrics["train_loss"])
    ts.append(time.perf_counter() - t0 - 0.033)
if os.environ.get("BLISS_PROF_TRACE_REFIT"):
    jax.profiler.stop_trace()
    log("refit step trace in /tmp/bliss_prof_refit_step")
ovf = {k: int(v) for k, v in metrics.items() if "overflow" in k and int(v)}
log(f"refit full train step: {min(ts)*1e3:.0f} ms "
    f"(loss {float(metrics['train_loss']):.3f}, overflow {ovf or 'none'})")

# --- fwd / fwd+bwd attribution at the refit caps ------------------------
blocks_t, _ = out_t
x_t = jnp.take(graph.ndata["features"], blocks_t[0].src_gids, axis=0)
params = state.params


def fwd(params, blocks, x):
    logits, aux = model.apply(params, blocks, x, deterministic=True)
    return jnp.sum(logits.astype(jnp.float32))


def fwdbwd(params, blocks, x):
    loss, grads = jax.value_and_grad(fwd)(params, blocks, x)
    return loss, grads


f_fwd = jax.jit(fwd)
f_fb = jax.jit(fwdbwd)
float(f_fwd(params, blocks_t, x_t))
ts = []
for _ in range(3):
    t0 = time.perf_counter()
    v = float(f_fwd(params, blocks_t, x_t))
    ts.append(time.perf_counter() - t0 - 0.033)
log(f"model fwd only (refit blocks): {min(ts)*1e3:.1f} ms")
out_fb = f_fb(params, blocks_t, x_t)
jax.block_until_ready(out_fb)
ts = []
for _ in range(3):
    t0 = time.perf_counter()
    loss_v, grads = f_fb(params, blocks_t, x_t)
    float(loss_v)
    ts.append(time.perf_counter() - t0 - 0.033)
log(f"model fwd+bwd (refit blocks): {min(ts)*1e3:.1f} ms")

# exp3 update alone
from bliss_gnn_tpu.sampling.samplers import exp3_update  # noqa: E402

emb_norms = [jnp.ones(b.n_src_cap, jnp.float32) for b in blocks_t]
# the GAT reward path additionally consumes per-edge attention logits
a_ijs = (
    [jnp.ones(b.e_cap, jnp.float32) for b in blocks_t]
    if MODEL == "gat" else None
)


def exp3_only(e, blocks, g):
    return exp3_update(g, cfg, e, blocks, emb_norms, a_ijs,
                       normalize=False)


f_e3 = jax.jit(exp3_only, donate_argnums=0)
e3 = f_e3(state.exp3_weights, blocks_t, graph)
jax.block_until_ready(e3)
ts = []
for _ in range(3):
    t0 = time.perf_counter()
    e3 = f_e3(e3, blocks_t, graph)
    float(e3.reshape(-1)[0])
    ts.append(time.perf_counter() - t0 - 0.033)
log(f"exp3 update only (donated): {min(ts)*1e3:.1f} ms")

# --- decompose the exp3 update ------------------------------------------
from bliss_gnn_tpu.sampling.samplers import (  # noqa: E402
    apply_exp3_deltas,
    exp3_edge_deltas,
)


def deltas_only(blocks, g):
    d = exp3_edge_deltas(g, cfg, blocks, emb_norms, a_ijs)
    return d


f_d = jax.jit(deltas_only)
dls = f_d(blocks_t, graph)
jax.block_until_ready(dls)
ts = []
for _ in range(3):
    t0 = time.perf_counter()
    dls = f_d(blocks_t, graph)
    float(dls[0][1][0])
    ts.append(time.perf_counter() - t0 - 0.033)
log(f"exp3 deltas only: {min(ts)*1e3:.1f} ms")

f_a = jax.jit(
    lambda e, d: apply_exp3_deltas(e, d, normalize=False), donate_argnums=0
)
e3b = f_a(e3, dls)
jax.block_until_ready(e3b)
ts = []
for _ in range(3):
    t0 = time.perf_counter()
    e3b = f_a(e3b, dls)
    float(e3b.reshape(-1)[0])
    ts.append(time.perf_counter() - t0 - 0.033)
log(f"exp3 apply only (donated): {min(ts)*1e3:.1f} ms")
