"""Parallelism: device mesh, sharding specs, expert/tensor parallel forward."""
