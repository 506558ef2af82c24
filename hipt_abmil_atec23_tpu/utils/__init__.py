"""Shared utilities: config tree, seeding, logging, registries."""
