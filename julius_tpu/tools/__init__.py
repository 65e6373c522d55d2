"""Offline tools: synthetic model builders, format converters, benchmarks."""
