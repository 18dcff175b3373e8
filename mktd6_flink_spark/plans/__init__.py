"""Query plans: the driver-contract query registry (driver_queries) and
composed reference dataflows (market_sim, share_price)."""
