from .gnn import GNN, SAGEConv, GCNConv, GATConv, PinSAGEConv, build_model  # noqa: F401
