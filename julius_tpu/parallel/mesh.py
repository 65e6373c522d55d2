"""Mesh construction and engine sharding.

The reference has no distributed execution (SURVEY.md §2.4): its
concurrency is an audio pthread, OpenMP row-splits of the DNN matvec and
one optional CUDA device.  The TPU-native mapping is:

  * **dp** (data parallel): utterance batches sharded across chips —
    subsumes the reference's multi-instance time-slicing (pass1.c:112)
    and socket-pipelined frontends (adinnet/vecnet);
  * **tp** (tensor parallel): the DNN feed-forward's hidden dimension
    sharded across chips — the scaled-up analogue of the reference's
    OpenMP per-layer row split (calc_dnn.c:806-833 begin[]/end[]), with
    XLA inserting the all-reduce the CPU code never needed;

pp/ep have no analogue: an HMM decoder has neither pipeline stages with
weight-heavy boundaries nor experts; the decoder is replicated and rides
dp.  Sharding is expressed with `jax.sharding.NamedSharding` and GSPMD
propagation — collectives are inserted by XLA, not hand-written.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import numpy as np
from jax.experimental import mesh_utils
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None, tp: int = 1) -> Mesh:
    """('dp', 'tp') mesh over the first n devices."""
    devs = jax.devices()
    n = n_devices or len(devs)
    if n % tp != 0:
        raise ValueError(f"n_devices {n} not divisible by tp {tp}")
    arr = mesh_utils.create_device_mesh((n // tp, tp), devices=devs[:n])
    return Mesh(arr, ("dp", "tp"))


def shard_engine(engine, mesh: Mesh) -> None:
    """Place the engine's device tables onto the mesh in-place.

    Search tables and GMM tables are replicated (they are read-only
    gather targets); DNN weights are tensor-sharded over 'tp' on the
    hidden dimension."""
    repl = NamedSharding(mesh, P())

    def put_repl(tree):
        return jax.tree_util.tree_map(
            lambda a: jax.device_put(a, repl), tree)

    engine.dev_net = put_repl(engine.dev_net)
    if engine.ngram_dev is not None:
        engine.ngram_dev = put_repl(engine.ngram_dev)
    if engine.gmm_tables is not None:
        engine.gmm_tables = put_repl(engine.gmm_tables)
    if engine.dnn_scorer is not None:
        sc = engine.dnn_scorer
        shard_out = NamedSharding(mesh, P(None, "tp"))
        shard_vec = NamedSharding(mesh, P("tp"))
        shard_in = NamedSharding(mesh, P("tp", None))
        n = len(sc.weights)
        new_w = []
        for i, w in enumerate(sc.weights):
            if i == 0:
                new_w.append(jax.device_put(w, shard_out))
            else:
                # both dims involved; shard output dim, XLA re-shards
                new_w.append(jax.device_put(w, shard_out))
        sc.weights = new_w
        sc.biases = [jax.device_put(b, shard_vec) for b in sc.biases]
        sc.output_w = jax.device_put(sc.output_w, shard_in)
        sc.output_b = jax.device_put(sc.output_b, repl)
        sc.log_prior = jax.device_put(sc.log_prior, repl)


def parallel_decode_fn(engine, mesh: Mesh):
    """Jitted batched decode with the utterance batch sharded over dp.

    Returns fn(wave [B, L], lengths [B]) -> (Trellis, n_frames); B must
    be divisible by the dp axis size.  Pass 1 uses the XLA formulation
    here (a pallas_call cannot be GSPMD-partitioned; the fused kernel
    is the single-chip fast path)."""
    import dataclasses

    import jax.numpy as jnp
    from julius_tpu.search import pass1 as p1

    cfg = dataclasses.replace(engine.p1_cfg, use_pallas=False)

    def decode(wave, lengths):
        feats, mask = engine._features(wave, lengths)
        nfr = jnp.sum(mask.astype(jnp.int32), axis=-1)
        out_ext = engine._outprob(feats)
        trellis = p1.pass1_batch(engine.dev_net, engine.ngram_dev, cfg,
                                 out_ext, nfr)
        return trellis, nfr

    data = NamedSharding(mesh, P("dp"))
    wave_s = NamedSharding(mesh, P("dp", None))
    return jax.jit(decode, in_shardings=(wave_s, data))
