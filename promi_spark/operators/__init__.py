"""Operator inventory (SURVEY §2). Each module registers its public
operators in :data:`promi_spark.plans.registry.REGISTRY` so YAML/JSON
pipelines can instantiate them by name (plugin-registry parity with
reference ``src/stream/plugin.rs``)."""
