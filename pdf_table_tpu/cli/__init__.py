"""CLI entry point (reference src/pdftable/cli/, `pdftable` console script)."""
