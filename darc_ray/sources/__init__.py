"""Table IO and seed sources."""
