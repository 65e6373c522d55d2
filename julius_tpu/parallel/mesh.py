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
        # Megatron-style alternating column/row parallelism down the
        # sigmoid MLP chain — the scaled-up analogue of the reference's
        # OpenMP per-layer row split (calc_dnn.c:806-833):
        #   col layer: W P(None, 'tp') -> activation sharded on features,
        #              bias sharded, sigmoid runs sharded;
        #   row layer: W P('tp', None) -> contraction over the sharded
        #              dim, ONE psum, replicated activation + bias.
        # One all-reduce per (col, row) layer PAIR instead of an
        # all-gather per layer (uniform column sharding re-shards every
        # activation).  The dryrun asserts the collective count.
        sc = engine.dnn_scorer
        shard_col = NamedSharding(mesh, P(None, "tp"))
        shard_row = NamedSharding(mesh, P("tp", None))
        shard_vec = NamedSharding(mesh, P("tp"))
        new_w, new_b = [], []
        for i, (w, b) in enumerate(zip(sc.weights, sc.biases)):
            if i % 2 == 0:
                new_w.append(jax.device_put(w, shard_col))
                new_b.append(jax.device_put(b, shard_vec))
            else:
                new_w.append(jax.device_put(w, shard_row))
                new_b.append(jax.device_put(b, repl))
        sc.weights = new_w
        sc.biases = new_b
        if len(sc.weights) % 2 == 1:
            # last hidden layer was col-parallel: the output matmul is
            # its row-parallel partner
            sc.output_w = jax.device_put(sc.output_w, shard_row)
        else:
            sc.output_w = jax.device_put(sc.output_w, shard_col)
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
