"""Stateful services: sharded frontier/seen actors, host state, checkpoints."""
