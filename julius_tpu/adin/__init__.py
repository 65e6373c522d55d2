"""Audio input layer: file readers, native trigger/VAD, network audio."""
