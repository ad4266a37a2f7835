"""Plan-level constructs that need driver-side orchestration (the only two
places the engine steps outside a single Catalyst plan): recursive CTE
fixpoint iteration and (future) materialized-view refresh."""
