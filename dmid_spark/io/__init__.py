from .bucketed import (  # noqa: F401
    read_bucketed,
    write_bucketed,
)
from .layout import (  # noqa: F401
    write_zordered,
    zorder_key,
)
from .formats import (  # noqa: F401
    cover_from_doca_lines,
    read_cover_and_graph,
    read_cover_json,
    read_dmid_adjacency,
    read_ground_truth_cover,
    read_snap_edge_list,
    read_ucinet,
    write_cover_json_lines,
    write_dmid_adjacency_lines,
)
from .generators import rmat_edges  # noqa: F401
