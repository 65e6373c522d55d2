from julius_tpu.io.htk_hmm import load_hmmdefs  # noqa: F401
from julius_tpu.io.hmmlist import load_hmmlist  # noqa: F401
from julius_tpu.io.htk_dict import load_htkdict, Vocabulary  # noqa: F401
from julius_tpu.io.arpa import load_arpa, NGramLM  # noqa: F401
from julius_tpu.io.dfa import load_dfa, DFAGrammar  # noqa: F401
