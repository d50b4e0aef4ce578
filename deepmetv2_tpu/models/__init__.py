from deepmetv2_tpu.models.graph_met import (  # noqa: F401
    graph_met_apply,
    graph_met_init,
    net_apply,
    pdg_remap,
)
