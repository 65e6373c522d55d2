"""julius_tpu — a TPU-native large-vocabulary continuous speech recognition
(LVCSR) framework with the capabilities of Julius (julius-speech/julius v4.6).

This is NOT a port: the compute path is JAX/XLA/Pallas (dense tensor Viterbi
over a CSR-flattened lexicon tree, batched GMM/DNN state scoring on the MXU,
`lax.scan` over time), and scale-out is jax.sharding over device meshes.

Layer map (mirrors reference SURVEY.md §1, rebuilt TPU-first):
  io/        - model & audio file formats (HTK hmmdefs, HMMList, dict,
               ARPA n-gram, DFA grammar, dnnconf+npy, HTK param, WAV)
  models/    - flattened device-ready model structures (HMMSet, Lexicon
               tree tensors, NGram tables, DNN params)
  frontend/  - batched MFCC/FBANK feature extraction, streaming MAP-CMN, VAD
  ops/       - acoustic scoring kernels (GMM as matmuls, DNN FFN, log-add)
  search/    - pass-1 frame-synchronous dense Viterbi beam, word trellis,
               pass-2 stack decoding, forced alignment, lattice/confnet
  parallel/  - mesh construction, sharding specs, data-parallel batching
  server/    - module-mode / adinnet protocol servers
  tools/     - offline model tooling (mkbingram equivalents etc.)
"""

__version__ = "0.1.0"

from julius_tpu.config import (  # noqa: F401
    AMConfig,
    FrontendConfig,
    LMConfig,
    SearchConfig,
    EngineConfig,
)
