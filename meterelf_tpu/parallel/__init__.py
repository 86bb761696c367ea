"""Multi-chip / multi-host scaling (device mesh, collectives)."""
