from julius_tpu.models.hmm import HMMSet, PseudoPhoneSets  # noqa: F401
# lexicon imported lazily (models.lexicon) to avoid jax import at parse time
