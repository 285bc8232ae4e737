from .fit import fit_materials, render_loss, select_params  # noqa: F401
