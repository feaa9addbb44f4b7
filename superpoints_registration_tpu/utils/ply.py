"""Minimal PLY point-cloud reader/writer (binary little-endian + ascii).

Functional parity target: src/models/backbone_kpconv/utils/ply.py (351 LoC)
— used there for kernel-disposition caching; here provided as a general IO
utility (kernel dispositions are generated in memory instead).
"""
from __future__ import annotations

import numpy as np

_DTYPES = {
    'float': 'f4', 'float32': 'f4', 'double': 'f8', 'float64': 'f8',
    'int': 'i4', 'int32': 'i4', 'uint': 'u4', 'uint32': 'u4',
    'short': 'i2', 'int16': 'i2', 'ushort': 'u2', 'uint16': 'u2',
    'char': 'i1', 'int8': 'i1', 'uchar': 'u1', 'uint8': 'u1',
}
_INV_DTYPES = {'f4': 'float', 'f8': 'double', 'i4': 'int', 'u4': 'uint',
               'i2': 'short', 'u2': 'ushort', 'i1': 'char', 'u1': 'uchar'}


def read_ply(path: str) -> dict:
    """Read a PLY file; returns {property_name: (N,) array} for the vertex
    element."""
    with open(path, 'rb') as f:
        line = f.readline().strip()
        if line != b'ply':
            raise ValueError('not a PLY file')
        fmt = None
        n_vertex = 0
        props = []
        while True:
            line = f.readline().strip().decode()
            if line.startswith('format'):
                fmt = line.split()[1]
            elif line.startswith('element vertex'):
                n_vertex = int(line.split()[-1])
            elif line.startswith('element'):
                raise NotImplementedError('only vertex elements supported')
            elif line.startswith('property'):
                _, dtype, name = line.split()
                props.append((name, _DTYPES[dtype]))
            elif line == 'end_header':
                break

        if fmt == 'ascii':
            data = np.loadtxt(f, dtype=np.float64, max_rows=n_vertex)
            data = np.atleast_2d(data)
            return {name: data[:, i].astype(dt)
                    for i, (name, dt) in enumerate(props)}
        endian = '<' if 'little' in fmt else '>'
        dtype = np.dtype([(name, endian + dt) for name, dt in props])
        data = np.frombuffer(f.read(dtype.itemsize * n_vertex), dtype=dtype)
        return {name: np.ascontiguousarray(data[name]) for name, _ in props}


def write_ply(path: str, arrays, names, binary: bool = True):
    """Write columns to PLY. arrays: one (N, k) array or list of (N,)/(N, k)
    arrays; names: flat list of property names matching total columns."""
    if isinstance(arrays, np.ndarray):
        arrays = [arrays]
    cols = []
    for a in arrays:
        a = np.asarray(a)
        if a.ndim == 1:
            cols.append(a)
        else:
            cols.extend(a[:, i] for i in range(a.shape[1]))
    assert len(cols) == len(names), f'{len(cols)} columns vs {len(names)} names'
    n = len(cols[0])

    dtype = np.dtype([(name, '<' + _DTYPES.get(str(c.dtype), c.dtype.str[1:])
                       if str(c.dtype) in _DTYPES else '<' + c.dtype.str[1:])
                      for name, c in zip(names, cols)])
    header = ['ply',
              'format binary_little_endian 1.0' if binary else 'format ascii 1.0',
              f'element vertex {n}']
    for name, c in zip(names, cols):
        header.append(f'property {_INV_DTYPES[c.dtype.str[1:]]} {name}')
    header.append('end_header')

    with open(path, 'wb') as f:
        f.write(('\n'.join(header) + '\n').encode())
        if binary:
            rec = np.empty(n, dtype=dtype)
            for name, c in zip(names, cols):
                rec[name] = c
            f.write(rec.tobytes())
        else:
            np.savetxt(f, np.stack([c.astype(np.float64) for c in cols], 1))
