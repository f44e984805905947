from .formats import (  # noqa: F401
    cover_from_doca_lines,
    read_cover_json,
    read_dmid_adjacency,
    read_snap_edge_list,
    write_cover_json_lines,
    write_dmid_adjacency_lines,
)
