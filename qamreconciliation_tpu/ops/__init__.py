from .boxplus import box_plus, phi_llr, check_node_update, var_node_update

__all__ = ["box_plus", "phi_llr", "check_node_update", "var_node_update"]
