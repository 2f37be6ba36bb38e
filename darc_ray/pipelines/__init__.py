"""Pipelines: corpus generator, crawl engine, conformance oracle."""
