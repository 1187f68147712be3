"""Engine operators: mining, routing, spatial joins, kNN, dedup, pyramid."""
