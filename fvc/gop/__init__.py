from fvc.gop.engine import code_gop_scan, code_gop_bidirectional, gop_metrics
from fvc.gop.graphs import generate_graph, graph_from_batch, ref_index_from_graph, pruned_layers
