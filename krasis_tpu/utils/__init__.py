"""IO utilities: safetensors mmap reader, GGUF parser, disk caches."""
