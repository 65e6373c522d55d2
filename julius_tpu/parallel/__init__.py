"""Device-mesh parallelism: data-parallel batch decode + tensor-sharded
scoring (SURVEY.md §2.4 / §5.8 TPU mapping)."""
