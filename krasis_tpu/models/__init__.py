"""Model layer: parameter schema, layer graph, and forward functions."""
