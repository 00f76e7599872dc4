package graft.functions;

import java.nio.ByteBuffer;
import java.nio.ByteOrder;
import java.util.Base64;
import org.apache.datasketches.common.ArrayOfItemsSerDe;
import org.apache.datasketches.memory.Memory;

/**
 * Length-prefixed serde for byte-array sketch items — the one key type
 * DataSketches ships no stock serde for. Mirrors the reference's byte-array
 * key support (sketches of ByteArrayType row keys).
 */
public final class ArrayOfBytesArraySerDe extends ArrayOfItemsSerDe<byte[]> {

  @Override
  public byte[] serializeToByteArray(final byte[] item) {
    final ByteBuffer out = ByteBuffer.allocate(4 + item.length).order(ByteOrder.LITTLE_ENDIAN);
    out.putInt(item.length).put(item);
    return out.array();
  }

  @Override
  public byte[] serializeToByteArray(final byte[][] items) {
    int total = 0;
    for (final byte[] i : items) { total += 4 + i.length; }
    final ByteBuffer out = ByteBuffer.allocate(total).order(ByteOrder.LITTLE_ENDIAN);
    for (final byte[] i : items) { out.putInt(i.length).put(i); }
    return out.array();
  }

  @Override
  public byte[][] deserializeFromMemory(final Memory mem, final long offsetBytes, final int numItems) {
    final byte[][] result = new byte[numItems][];
    long off = offsetBytes;
    for (int i = 0; i < numItems; i++) {
      final int len = mem.getInt(off);
      off += 4;
      final byte[] item = new byte[len];
      mem.getByteArray(off, item, 0, len);
      off += len;
      result[i] = item;
    }
    return result;
  }

  @Override
  public int sizeOf(final byte[] item) {
    return 4 + item.length;
  }

  @Override
  public int sizeOf(final Memory mem, final long offsetBytes, final int numItems) {
    long off = offsetBytes;
    for (int i = 0; i < numItems; i++) { off += 4 + mem.getInt(off); }
    return (int) (off - offsetBytes);
  }

  @Override
  public String toString(final byte[] item) {
    return Base64.getEncoder().encodeToString(item);
  }

  @Override
  public Class<byte[]> getClassOfT() {
    return byte[].class;
  }
}
