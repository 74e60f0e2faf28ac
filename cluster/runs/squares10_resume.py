"""squares-10 paper-run continuation (VERDICT r2 item 1).

Round 2 trained the full paper model to its configured 200k-step budget
(reference budget: 2.5M, /root/reference/configs/dimension_estimation/
paper/image_data/squares/10.py); the 11->10 read-out crossing is
extrapolated at ~250-300k steps.  Resume from the exact pickled run
config with the iteration budget raised so the run crosses the flip.
"""
import pickle


def get_config():
    with open("/root/repo/logs/squares_paper/10/config.pkl", "rb") as f:
        c = pickle.load(f)
    c.training.n_iters = 500_000
    return c
