// adt_native: C++ kernels for host-side hot loops.
//
// The TPU owns the compute path (JAX/XLA/Pallas); this extension owns the two
// per-item host loops that remain after vectorization:
//   - decode_tokens: token stream -> note rows, replicating the reference
//     decoder's quirk semantics exactly (modules/midi_tokenizer.py:69-100) —
//     runs once per evaluated item;
//   - match_notes: maximum-cardinality bipartite onset matching
//     (Hopcroft-Karp over the onset-tolerance/pitch-cents feasibility graph,
//     mir_eval.transcription.match_notes semantics as used at eval.py:261-269)
//     — runs twice per item (aggregate + per-label slices).
//
// Built as a plain CPython extension (no pybind11 in this image); the Python
// side (`adt_str_tpu/native/__init__.py`) compiles it on demand with g++ and
// falls back to the pure-numpy implementations when unavailable.

#define PY_SSIZE_T_CLEAN
#include <Python.h>

#include <cmath>
#include <cstdint>
#include <cstring>
#include <map>
#include <queue>
#include <vector>

namespace {

constexpr int TIME_OFFSET = 4;
constexpr int PITCH_OFFSET = 300;
constexpr int VELOCITY_OFFSET = 400;

// ---------------------------------------------------------------- decoding

// Port of MidiTokenizer.decode quirk semantics: onsets keyed by token index,
// pitches attach only when index-1 held a time token, velocities when
// index-2 did; results zip positionally; velocity defaults to 100 when no
// velocity token decoded; ADTOF remaps the pitch through the class map again.
static int adtof_map(int pitch) {
  switch (pitch) {
    case 35: case 36: return 35;
    case 37: case 38: case 39: case 40: return 38;
    case 41: case 45: case 47: return 41;
    case 42: case 43: case 44: case 50: return 42;
    case 46: case 48: case 49: case 51: return 48;
    case 52: return 52;
    case 58: return 58;
    case 53: case 54: case 55: case 56: case 57:
    case 59: case 60: case 61: return 61;
    default: return pitch;
  }
}

static PyObject* decode_tokens(PyObject*, PyObject* args) {
  PyObject* tokens_obj;
  int adtof, bos, eos;
  if (!PyArg_ParseTuple(args, "Oiii", &tokens_obj, &adtof, &bos, &eos))
    return nullptr;
  PyObject* seq = PySequence_Fast(tokens_obj, "tokens must be a sequence");
  if (!seq) return nullptr;
  Py_ssize_t n = PySequence_Fast_GET_SIZE(seq);

  // insertion-ordered maps keyed by token index
  std::vector<std::pair<Py_ssize_t, double>> onsets;
  std::map<Py_ssize_t, size_t> onset_pos;  // index -> slot in `onsets`
  std::vector<std::pair<Py_ssize_t, double>> pitches;
  std::vector<std::pair<Py_ssize_t, double>> velocities;

  for (Py_ssize_t i = 0; i < n; ++i) {
    long token = PyLong_AsLong(PySequence_Fast_GET_ITEM(seq, i));
    if (token == -1 && PyErr_Occurred()) { Py_DECREF(seq); return nullptr; }
    if (token == bos || token == eos) continue;
    if (token >= TIME_OFFSET && token < PITCH_OFFSET) {
      onset_pos[i] = onsets.size();
      onsets.emplace_back(i, (token - TIME_OFFSET) / 100.0);
    } else if (token >= PITCH_OFFSET && token < VELOCITY_OFFSET) {
      int pitch = (int)(token - PITCH_OFFSET);
      if (adtof) pitch = adtof_map(pitch);
      if (onset_pos.find(i - 1) == onset_pos.end()) continue;
      pitches.emplace_back(i - 1, (double)pitch);
    } else if (token >= VELOCITY_OFFSET) {
      if (onset_pos.find(i - 2) == onset_pos.end()) continue;
      velocities.emplace_back(i - 2, (double)(token - VELOCITY_OFFSET));
    }
  }
  Py_DECREF(seq);

  bool default_vel = velocities.empty();
  size_t rows = onsets.size();
  rows = std::min(rows, pitches.size());
  if (!default_vel) rows = std::min(rows, velocities.size());

  PyObject* out = PyList_New((Py_ssize_t)rows);
  if (!out) return nullptr;
  for (size_t r = 0; r < rows; ++r) {
    double onset = onsets[r].second;
    double pitch = pitches[r].second;
    double vel = default_vel ? 100.0 : velocities[r].second;
    PyObject* row = Py_BuildValue("(dddd)", onset, onset + 0.1, pitch, vel);
    if (!row) { Py_DECREF(out); return nullptr; }
    PyList_SET_ITEM(out, (Py_ssize_t)r, row);
  }
  return out;
}

// ---------------------------------------------------------- bipartite match

struct HK {
  int nl, nr;
  std::vector<std::vector<int>> adj;
  std::vector<int> ml, mr, dist;

  explicit HK(int left, int right) : nl(left), nr(right), adj(left) {}

  bool bfs() {
    std::queue<int> q;
    dist.assign(nl, -1);
    for (int u = 0; u < nl; ++u)
      if (ml[u] == -1) { dist[u] = 0; q.push(u); }
    bool found = false;
    while (!q.empty()) {
      int u = q.front(); q.pop();
      for (int v : adj[u]) {
        int w = mr[v];
        if (w == -1) found = true;
        else if (dist[w] == -1) { dist[w] = dist[u] + 1; q.push(w); }
      }
    }
    return found;
  }

  bool dfs(int u) {
    for (int v : adj[u]) {
      int w = mr[v];
      if (w == -1 || (dist[w] == dist[u] + 1 && dfs(w))) {
        ml[u] = v; mr[v] = u;
        return true;
      }
    }
    dist[u] = -2;
    return false;
  }

  int run() {
    ml.assign(nl, -1);
    mr.assign(nr, -1);
    int matched = 0;
    while (bfs())
      for (int u = 0; u < nl; ++u)
        if (ml[u] == -1 && dfs(u)) ++matched;
    return matched;
  }
};

static bool to_double_vec(PyObject* obj, std::vector<double>& out) {
  PyObject* seq = PySequence_Fast(obj, "expected a sequence of floats");
  if (!seq) return false;
  Py_ssize_t n = PySequence_Fast_GET_SIZE(seq);
  out.resize((size_t)n);
  for (Py_ssize_t i = 0; i < n; ++i) {
    out[(size_t)i] = PyFloat_AsDouble(PySequence_Fast_GET_ITEM(seq, i));
    if (out[(size_t)i] == -1.0 && PyErr_Occurred()) { Py_DECREF(seq); return false; }
  }
  Py_DECREF(seq);
  return true;
}

static PyObject* match_notes(PyObject*, PyObject* args) {
  PyObject *ro, *rp, *eo, *ep;
  double onset_tol, pitch_tol_cents;
  if (!PyArg_ParseTuple(args, "OOOOdd", &ro, &rp, &eo, &ep, &onset_tol,
                        &pitch_tol_cents))
    return nullptr;
  std::vector<double> ref_on, ref_pi, est_on, est_pi;
  if (!to_double_vec(ro, ref_on) || !to_double_vec(rp, ref_pi) ||
      !to_double_vec(eo, est_on) || !to_double_vec(ep, est_pi))
    return nullptr;

  int nl = (int)ref_on.size(), nr = (int)est_on.size();
  HK hk(nl, nr);
  for (int i = 0; i < nl; ++i) {
    for (int j = 0; j < nr; ++j) {
      // mir_eval rounds onset distances to 12 decimals before comparing so
      // a delta of exactly the tolerance (0.65-0.6 = 0.05000000000000004 in
      // fp64) still matches; mirror that (ops/matching.py N_DECIMALS)
      double d = std::round(std::fabs(ref_on[i] - est_on[j]) * 1e12) / 1e12;
      if (d > onset_tol) continue;
      double cents = 1200.0 * std::fabs(std::log2(est_pi[j] / ref_pi[i]));
      // NaN-safe: `cents > tol` is false for NaN (0/0 pitch ratio) and would
      // keep the pair; the numpy oracle's `cents <= tol` rejects it
      if (!(cents <= pitch_tol_cents)) continue;
      hk.adj[i].push_back(j);
    }
  }
  hk.run();
  PyObject* out = PyList_New(0);
  if (!out) return nullptr;
  for (int u = 0; u < nl; ++u) {
    if (hk.ml[u] != -1) {
      PyObject* pair = Py_BuildValue("(ii)", u, hk.ml[u]);
      if (!pair || PyList_Append(out, pair) < 0) {
        Py_XDECREF(pair); Py_DECREF(out); return nullptr;
      }
      Py_DECREF(pair);
    }
  }
  return out;
}

static PyMethodDef methods[] = {
    {"decode_tokens", decode_tokens, METH_VARARGS,
     "decode_tokens(tokens, adtof, bos, eos) -> list of (on, off, pitch, vel)"},
    {"match_notes", match_notes, METH_VARARGS,
     "match_notes(ref_on, ref_pi, est_on, est_pi, onset_tol, pitch_tol_cents)"
     " -> list of (ref_idx, est_idx)"},
    {nullptr, nullptr, 0, nullptr},
};

static struct PyModuleDef moduledef = {
    PyModuleDef_HEAD_INIT, "_adt_native", nullptr, -1, methods,
};

}  // namespace

PyMODINIT_FUNC PyInit__adt_native(void) { return PyModule_Create(&moduledef); }
