# Generator for the bundled CAMB ini template (modern pip CAMB inifile
# driver).  Run once: python scripts/templates/camb_modern.ini.py
#
# Emits a minimal parameter file with the placeholder interface used by
# scripts/run_redtime.py (CAMB_TEMPLATE_*), the 33-redshift Mira-Titan
# transfer stack, and high-precision transfer settings (kmax=50,
# k_per_logint=1000 — the "ground truth" configuration of the reference's
# stored test outputs).  Unspecified CAMB parameters take CAMB defaults.

Z_LIST = [
    "200", "100", "50", "20", "10", "5", "4", "3", "2.5",
    "2.0180180180180183", "1.8", "1.6103896103896105", "1.4", "1.2",
    "1.0059880239520962", "0.8", "0.75", "0.7", "0.655683690280066",
    "0.62", "0.58", "0.54", "0.5", "0.47", "0.43366619115549243", "0.4",
    "0.35", "0.3", "0.2422744128553771", "0.2", "0.15",
    "0.10076670317634195", "0",
]

HEAD = """\
# CAMB parameter template for the redtime_tpu pipeline.
# Placeholders (CAMB_TEMPLATE_*) are substituted by scripts/run_redtime.py.

output_root = CAMB_TEMPLATE_OUTROOT

get_scalar_cls = T
get_transfer   = T
do_nonlinear   = 0
l_max_scalar   = 2000

use_physical = T
ombh2        = CAMB_TEMPLATE_OMBH2
omch2        = CAMB_TEMPLATE_OMCH2
omnuh2       = CAMB_TEMPLATE_OMNUH2
omk          = 0.0
hubble       = CAMB_TEMPLATE_H0

w  = CAMB_TEMPLATE_W0
wa = CAMB_TEMPLATE_WA
dark_energy_model = ppf
cs2_lam = 1

temp_cmb           = CAMB_TEMPLATE_TCMB
helium_fraction    = 0.24
massless_neutrinos = CAMB_TEMPLATE_MASSLESS_NU
massive_neutrinos  = CAMB_TEMPLATE_MASSIVE_NU
nu_mass_eigenstates = 1
nu_mass_degeneracies = 0
nu_mass_fractions = 1

initial_power_num  = 1
scalar_amp(1)      = CAMB_SCALAR_AMP
scalar_spectral_index(1) = CAMB_TEMPLATE_NS
scalar_nrun(1)     = 0

reionization = T
re_use_optical_depth = T
re_optical_depth = CAMB_TEMPLATE_TAU

# high-precision transfer functions (the reference test suite's
# "ground truth" settings: kmax=50, k_per_logint=1000)
transfer_high_precision = T
transfer_kmax           = 50
transfer_k_per_logint   = 1000
transfer_interp_matterpower = T
transfer_num_redshifts  = {n}
"""

TAIL = """
transfer_power_var = 7
scalar_output_file = scalCls.dat
output_file_headers = F
derived_parameters = F
feedback_level = 1
accuracy_boost = 1
l_accuracy_boost = 1
"""


def main():
    lines = [HEAD.format(n=len(Z_LIST))]
    for i, z in enumerate(Z_LIST, 1):
        lines.append(f"transfer_redshift({i}) = {z}")
    lines.append("")
    for i, z in enumerate(Z_LIST, 1):
        lines.append(f"transfer_filename({i}) = transfer_z{z_name(z)}.dat")
    lines.append(TAIL)
    out = __file__.replace(".ini.py", ".ini")
    with open(out, "w") as f:
        f.write("\n".join(lines))
    print(f"wrote {out}")


def z_name(z: str) -> str:
    # file naming mirrors the pipeline convention: camb_transfer_z{z}.dat
    return z


if __name__ == "__main__":
    main()
