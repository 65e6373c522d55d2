"""Search engine: decode network, pass-1 beam, trellis, pass-2 stack."""
