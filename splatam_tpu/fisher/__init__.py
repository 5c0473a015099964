from splatam_tpu.fisher.fisher import (
    eig_score,
    h_train_inverse,
    nonlinear_gain,
    render_fisher,
    silhouette_gain,
)

__all__ = [
    "eig_score",
    "h_train_inverse",
    "nonlinear_gain",
    "render_fisher",
    "silhouette_gain",
]
