"""Runtime: KV cache, generation engine, serving glue."""
