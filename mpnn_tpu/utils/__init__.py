from .desc import net_desc, render_net_desc, render_layer_desc, \
    render_stats, mean_split_stats
from .serdes import encode_net, decode_net, write_net, read_net

__all__ = [
    "net_desc", "render_net_desc", "render_layer_desc", "render_stats",
    "mean_split_stats", "encode_net", "decode_net", "write_net", "read_net",
]
