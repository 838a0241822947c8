from .edges import (build_edge_table, edge_sampling_vertex_grad,
                    loss_and_grads_with_edges)  # noqa: F401
