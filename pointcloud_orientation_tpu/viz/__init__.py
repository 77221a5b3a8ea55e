from .polar import plot_mvm_polar, batch_plot_mvm, plot_predicted_density
from .axes_export import export_prediction_plys

__all__ = [
    "plot_mvm_polar",
    "batch_plot_mvm",
    "plot_predicted_density",
    "export_prediction_plys",
]
