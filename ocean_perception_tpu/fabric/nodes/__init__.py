"""Executable nodes (reference: src/lcm_nodes + src/tools)."""
